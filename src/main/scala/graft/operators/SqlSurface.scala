package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL entry point: the same engine driven through `spark.sql`
  * over registered views — a user of the reference's query surface can
  * submit SQL text instead of DataFrame code and get identical plans
  * (Catalyst compiles both to the same logical algebra).
  *
  * Also exercises correlated-subquery decorrelation
  * (`RewriteCorrelatedScalarSubquery`, SURVEY.md §4): Spark rewrites
  * the correlated scalar/IN subqueries below into the same outer-join/
  * semi-join shapes the DataFrame queries use — no per-row re-execution.
  */
object SqlSurface {

  /** View registration is memoized per (session, sfDir): each
    * `Tables.x(s, d)` call eagerly reads parquet footers for schema
    * inference, so re-registering six views inside every query call
    * charges ~6 footer reads + catalog writes to the query's own
    * timing. Registration is catalog setup, not query work — do it
    * once. (Keyed on the session too, so a fresh session in a test
    * suite still gets its views; re-keyed if the sfDir changes.) */
  private val registeredFor =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  private def withViews(s: SparkSession, d: String): Unit = {
    if (registeredFor.get(s) != d) synchronized {
      if (registeredFor.get(s) != d) {
        Tables.customer(s, d).createOrReplaceTempView("v_customer")
        Tables.orders(s, d).createOrReplaceTempView("v_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
        Tables.supplier(s, d).createOrReplaceTempView("v_supplier")
        Tables.part(s, d).createOrReplaceTempView("v_part")
        Tables.nation(s, d).createOrReplaceTempView("v_nation")
        Tables.region(s, d).createOrReplaceTempView("v_region")
        registeredFor.put(s, d)
      }
    }
  }

  /** Correlated scalar subquery → decorrelated left outer aggregate. */
  private val subqueryScalar = QueryDef(
    "subquery_scalar",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT c_custkey,
                 round(coalesce((SELECT max(o_totalprice) FROM v_orders
                                 WHERE o_custkey = c_custkey), 0), 2) AS max_spend
               FROM v_customer ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey,
              round(coalesce((SELECT max(o_totalprice) FROM orders
                              WHERE o_custkey = c_custkey), 0), 2) AS max_spend
            FROM customer ORDER BY c_custkey"""))

  /** IN-subquery → decorrelated semi join. */
  private val subqueryIn = QueryDef(
    "subquery_in",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT o_orderkey, o_custkey FROM v_orders
               WHERE o_custkey IN (SELECT c_custkey FROM v_customer
                                   WHERE c_mktsegment = 'BUILDING')
               ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey"""))

  /** Correlated NOT EXISTS with an extra correlated predicate →
    * decorrelated left-anti join (the SQL-text twin of `join_anti`):
    * customers with no recent (mid-2000+) order. */
  private val subqueryExists = QueryDef(
    "subquery_exists",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT c_custkey, c_nationkey FROM v_customer c
               WHERE NOT EXISTS (SELECT 1 FROM v_orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderdate >= TIMESTAMP '2000-06-01')
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_nationkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '2000-06-01')
            ORDER BY c_custkey"""))

  /** TPC-H Q3 shape submitted as SQL text: segment filter, 3-way join,
    * cents-exact revenue, top-10. Same determinism rules as the
    * DataFrame queries (exact integer cents; unique-key tiebreak). */
  private val sqlTpchQ3 = QueryDef(
    "sql_tpch_q3",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT l_orderkey,
                 round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
                       / 10000, 2) AS revenue,
                 CAST(count(*) AS BIGINT) AS n_items
               FROM v_customer
               JOIN v_orders   ON c_custkey = o_custkey
               JOIN v_lineitem ON l_orderkey = o_orderkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '2000-03-15'
                 AND l_shipdate  > TIMESTAMP '2000-03-15'
               GROUP BY l_orderkey
               ORDER BY revenue DESC, l_orderkey ASC
               LIMIT 10""")
    },
    Some("""SELECT l_orderkey,
              round(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                    AS DOUBLE) / 10000, 2) AS revenue,
              CAST(count(*) AS BIGINT) AS n_items
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '2000-03-15'
              AND l_shipdate  > TIMESTAMP '2000-03-15'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10"""))

  /** NOT IN with a NULLABLE probe key — the classic three-valued-logic
    * trap (NOT IN is NOT the complement of IN once NULLs appear: a
    * NULL probe yields NULL, so the row is filtered). Spark plans this
    * as a null-aware anti join (broadcast-only strategy — the
    * null-awareness cannot be shuffled); DuckDB evaluates the same
    * standard semantics, so both engines drop the NULL-key rows. */
  private val subqueryNotIn = QueryDef(
    "subquery_not_in",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT o_orderkey, o_custkey
               FROM (SELECT o_orderkey, o_custkey,
                       CASE WHEN o_orderkey % 50 = 0 THEN NULL
                            ELSE o_custkey END AS probe_key
                     FROM v_orders)
               WHERE probe_key NOT IN (SELECT c_custkey FROM v_customer
                                       WHERE c_mktsegment = 'BUILDING')
               ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey
            FROM (SELECT o_orderkey, o_custkey,
                    CASE WHEN o_orderkey % 50 = 0 THEN NULL
                         ELSE o_custkey END AS probe_key
                  FROM orders)
            WHERE probe_key NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey"""))

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL-text
    * top-N-per-group idiom. Catalyst decorrelates the lateral into a
    * partitioned rank under the hood, so the plan is the same one
    * `topk_per_group` declares with window functions: no per-row
    * re-execution, one shuffle on the correlation key. Balances in
    * exact cents; unique (bal, custkey) tiebreak. */
  private val sqlLateralTopn = QueryDef(
    "sql_lateral_topn",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT n_name, t.c_custkey, t.bal
               FROM v_nation n,
               LATERAL (SELECT c_custkey,
                          CAST(round(c_acctbal * 100) AS BIGINT) AS bal
                        FROM v_customer c
                        WHERE c.c_nationkey = n.n_nationkey
                        ORDER BY bal DESC, c_custkey ASC LIMIT 2) t
               ORDER BY n_name, bal DESC, c_custkey""")
    },
    Some("""SELECT n_name, t.c_custkey, t.bal
            FROM nation n,
            LATERAL (SELECT c_custkey,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS bal
                     FROM customer c
                     WHERE c.c_nationkey = n.n_nationkey
                     ORDER BY bal DESC, c_custkey ASC LIMIT 2) t
            ORDER BY n_name, bal DESC, c_custkey"""))

  /** TPC-H Q10 shape: returned-item revenue by customer + nation over
    * one order quarter, top-20. Adds the 4-way join (two fact, two
    * dimension — nation broadcast) missing from Q3/Q5 coverage; same
    * cents-exact revenue and unique-key tiebreak rules. */
  private val sqlTpchQ10 = QueryDef(
    "sql_tpch_q10",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT c_custkey, c_name, n_name,
                 round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
                       / 10000, 2) AS revenue,
                 CAST(count(*) AS BIGINT) AS n_items
               FROM v_customer
               JOIN v_orders   ON c_custkey = o_custkey
               JOIN v_lineitem ON l_orderkey = o_orderkey
               JOIN v_nation   ON c_nationkey = n_nationkey
               WHERE o_orderdate >= TIMESTAMP '2000-03-01'
                 AND o_orderdate <  TIMESTAMP '2000-06-01'
                 AND l_returnflag = 'R'
               GROUP BY c_custkey, c_name, n_name
               ORDER BY revenue DESC, c_custkey ASC
               LIMIT 20""")
    },
    Some("""SELECT c_custkey, c_name, n_name,
              round(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                    AS DOUBLE) / 10000, 2) AS revenue,
              CAST(count(*) AS BIGINT) AS n_items
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '2000-03-01'
              AND o_orderdate <  TIMESTAMP '2000-06-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20"""))

  /** Explicit GROUPING SETS (beyond rollup/cube): the mixed subtotal
    * shape submitted as SQL on both engines. */
  private val groupingSets = QueryDef(
    "agg_grouping_sets",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
                 coalesce(l_linestatus, 'ALL') AS status,
                 CAST(count(*) AS BIGINT) AS n
               FROM v_lineitem
               GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                       (l_returnflag), ())
               ORDER BY flag, status""")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
              coalesce(l_linestatus, 'ALL') AS status,
              CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
            ORDER BY flag, status"""))

  /** TPC-H Q5 shape: six-table star join (customer⋈orders⋈lineitem⋈
    * supplier⋈nation⋈region) with the local-supplier correlation
    * (c_nationkey = s_nationkey), region + date filters, cents-exact
    * revenue per nation. Catalyst reorders the join tree and
    * broadcasts the three dims (nation/region/supplier are tiny at
    * every SF); only the two fact tables shuffle. */
  private val sqlTpchQ5 = QueryDef(
    "sql_tpch_q5",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT n_name,
                 round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
                       / 10000, 2) AS revenue
               FROM v_customer
               JOIN v_orders   ON c_custkey = o_custkey
               JOIN v_lineitem ON l_orderkey = o_orderkey
               JOIN v_supplier ON l_suppkey = s_suppkey
                              AND c_nationkey = s_nationkey
               JOIN v_nation   ON s_nationkey = n_nationkey
               JOIN v_region   ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA'
                 AND o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate <  TIMESTAMP '1998-01-01'
               GROUP BY n_name
               ORDER BY revenue DESC, n_name ASC""")
    },
    Some("""SELECT n_name,
              round(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                    AS DOUBLE) / 10000, 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC"""))

  /** TPC-H Q6 shape: the pure scan-filter-aggregate forecast query.
    * Every predicate is pushdown-able to the parquet reader; the
    * revenue lands as one exact integer (cents × cents-of-discount =
    * 10⁻⁴ dollar units) so no float ever aggregates. */
  private val sqlTpchQ6 = QueryDef(
    "sql_tpch_q6",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_c4,
                 CAST(count(*) AS BIGINT) AS n_items
               FROM v_lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate <  TIMESTAMP '1997-01-01'
                 AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
                 AND l_quantity < 24""")
    },
    Some("""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4,
              CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24"""))

  /** TPC-H Q18 shape (large-volume customers): IN-subquery over a
    * grouped HAVING on the fact table, re-joined to the same fact for
    * the detail rows. Stresses the planner on aggregate-then-semijoin:
    * Catalyst runs the HAVING aggregate once, semi-joins orders on the
    * qualifying keys, and only then joins customer — no per-row
    * re-execution of the subquery. Quantities are whole numbers in the
    * data; summed as exact BIGINTs per the determinism rules. */
  private val sqlTpchQ18 = QueryDef(
    "sql_tpch_q18",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT c_name, c_custkey, o_orderkey,
                 unix_timestamp(o_orderdate) AS order_epoch,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
               FROM v_customer
               JOIN v_orders   ON c_custkey = o_custkey
               JOIN v_lineitem ON o_orderkey = l_orderkey
               WHERE o_orderkey IN (
                 SELECT l_orderkey FROM v_lineitem
                 GROUP BY l_orderkey
                 HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
               GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
               ORDER BY totalprice_c DESC, o_orderkey ASC
               LIMIT 100""")
    },
    Some("""SELECT c_name, c_custkey, o_orderkey,
              CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
              CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
              CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
            GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            ORDER BY totalprice_c DESC, o_orderkey ASC
            LIMIT 100"""))

  /** TPC-H Q21 shape (suppliers who kept orders waiting): chained
    * correlated EXISTS (another supplier touched the order) + NOT
    * EXISTS (no OTHER supplier was late) over the same fact table,
    * i.e. a semi join and an anti join both correlated on l_orderkey
    * — with the twist that "late" here is relative to the OUTER
    * query's order date (the data has no receipt/commit dates), so the
    * anti join's condition references an outer column beyond the
    * equi-key and Catalyst's DecorrelateInnerQuery must carry it into
    * the join condition. Both engines decorrelate rather than
    * re-executing per row. */
  private val sqlTpchQ21 = QueryDef(
    "sql_tpch_q21",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
               FROM v_supplier
               JOIN v_lineitem l1 ON s_suppkey = l1.l_suppkey
               JOIN v_orders o    ON o.o_orderkey = l1.l_orderkey
               JOIN v_nation      ON s_nationkey = n_nationkey
               WHERE o.o_orderstatus = 'F'
                 AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
                 AND EXISTS (
                   SELECT 1 FROM v_lineitem l2
                   WHERE l2.l_orderkey = l1.l_orderkey
                     AND l2.l_suppkey <> l1.l_suppkey)
                 AND NOT EXISTS (
                   SELECT 1 FROM v_lineitem l3
                   WHERE l3.l_orderkey = l1.l_orderkey
                     AND l3.l_suppkey <> l1.l_suppkey
                     AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
               GROUP BY s_name, n_name
               ORDER BY numwait DESC, s_name ASC
               LIMIT 100""")
    },
    Some("""SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
            FROM supplier
            JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            JOIN orders o    ON o.o_orderkey = l1.l_orderkey
            JOIN nation      ON s_nationkey = n_nationkey
            WHERE o.o_orderstatus = 'F'
              AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              AND EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY s_name, n_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 100"""))

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join with an extra join-side predicate (so unmatched customers
    * keep count 0), then a second aggregation OVER the first's output
    * — the two-level groupBy the distribution query class needs. The
    * outer count(o_orderkey) counts matches only (nulls skipped),
    * which is the exact semantic both engines share. */
  private val sqlTpchQ13 = QueryDef(
    "sql_tpch_q13",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
               FROM (SELECT c_custkey,
                       CAST(count(o_orderkey) AS BIGINT) AS c_count
                     FROM v_customer
                     LEFT OUTER JOIN v_orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '1-URGENT'
                     GROUP BY c_custkey)
               GROUP BY c_count
               ORDER BY custdist DESC, c_count DESC""")
    },
    Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (SELECT c_custkey,
                    CAST(count(o_orderkey) AS BIGINT) AS c_count
                  FROM customer
                  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '1-URGENT'
                  GROUP BY c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q22 shape (customers with balance but no orders): scalar
    * AVG subquery as the filter threshold + correlated NOT EXISTS anti
    * join + IN-list on a derived code, then aggregate. (Every
    * customer in the synthetic data has orders, so the anti join is
    * over the URGENT subset — customers with balance but no urgent
    * orders — keeping the result non-degenerate.) The threshold
    * is computed in exact integer cents with floor division — float
    * `avg()` differs in the last ulp between engines' summation
    * orders, which would flip boundary rows (determinism rules,
    * IMPLEMENTATION.md). */
  private val sqlTpchQ22 = QueryDef(
    "sql_tpch_q22",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
                 CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
               FROM (SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
                       c_custkey
                     FROM v_customer
                     WHERE c_nationkey % 5 IN (0, 1, 2, 3))
               WHERE bal_c > (
                   SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                               DIV count(*) AS BIGINT)
                   FROM v_customer WHERE c_acctbal > 0)
                 AND NOT EXISTS (
                   SELECT 1 FROM v_orders WHERE o_custkey = c_custkey
                     AND o_orderpriority = '1-URGENT')
               GROUP BY cntrycode
               ORDER BY cntrycode""")
    },
    Some("""SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
              CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
            FROM (SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode,
                    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
                    c_custkey
                  FROM customer
                  WHERE c_nationkey % 5 IN (0, 1, 2, 3)) t
            WHERE bal_c > (
                SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                            // count(*) AS BIGINT)
                FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = t.c_custkey
                  AND o_orderpriority = '1-URGENT')
            GROUP BY cntrycode
            ORDER BY cntrycode"""))

  /** TPC-H Q4 shape (order priority checking): correlated EXISTS whose
    * predicate does date arithmetic against the OUTER row (shipped >
    * 30 days after ITS order date) — decorrelated to a semi join with
    * the interval condition in the join, aggregated by priority. */
  private val sqlTpchQ4 = QueryDef(
    "sql_tpch_q4",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
               FROM v_orders
               WHERE o_orderdate >= TIMESTAMP '2000-01-01'
                 AND o_orderdate <  TIMESTAMP '2000-04-01'
                 AND EXISTS (
                   SELECT 1 FROM v_lineitem
                   WHERE l_orderkey = o_orderkey
                     AND l_shipdate > o_orderdate + INTERVAL 30 DAYS)
               GROUP BY o_orderpriority
               ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01'
              AND o_orderdate <  TIMESTAMP '2000-04-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  /** TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    * AGGREGATE subqueries per part (the avg-quantity threshold),
    * rewritten exactly — `q < 0.2·avg(q)` becomes the integer
    * inequality `5·q·count < sum`, so no float average can diverge
    * between engines. Catalyst decorrelates both scalar aggregates
    * into one grouped join against lineitem, not a per-row re-scan. */
  private val sqlTpchQ17 = QueryDef(
    "sql_tpch_q17",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS revenue_c
               FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
               WHERE p_brand = 'Brand#1'
                 AND 5 * CAST(round(l_quantity) AS BIGINT) *
                     (SELECT count(*) FROM v_lineitem l2
                      WHERE l2.l_partkey = p_partkey)
                   < (SELECT sum(CAST(round(l2.l_quantity) AS BIGINT))
                      FROM v_lineitem l2 WHERE l2.l_partkey = p_partkey)""")
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS revenue_c
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
              AND 5 * CAST(round(l_quantity) AS BIGINT) *
                  (SELECT count(*) FROM lineitem l2
                   WHERE l2.l_partkey = p_partkey)
                < (SELECT sum(CAST(round(l2.l_quantity) AS BIGINT))
                   FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""))

  val defs: Seq[QueryDef] = Seq(
    subqueryScalar, subqueryIn, subqueryExists, subqueryNotIn,
    sqlLateralTopn, sqlTpchQ3, sqlTpchQ4, sqlTpchQ5, sqlTpchQ6,
    sqlTpchQ10, sqlTpchQ13, sqlTpchQ17, sqlTpchQ18, sqlTpchQ21,
    sqlTpchQ22, groupingSets)
}
