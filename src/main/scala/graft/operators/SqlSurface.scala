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

  /** TPC-H Q2 shape (minimum-cost supplier): a correlated scalar MIN
    * subquery that itself contains a multi-table join (supplier ⋈
    * lineitem ⋈ nation ⋈ region), correlated on the outer part key —
    * the classic decorrelation stress. The data has no partsupp table,
    * so lineitem's (l_partkey, l_suppkey) pairs stand in for supply
    * relationships and s_acctbal for the supply cost; the comparison
    * runs in exact integer cents on both engines so the MIN-equality
    * never hits a float boundary. DISTINCT collapses the many
    * lineitems per (part, supplier) pair back to Q2's relation grain. */
  private val sqlTpchQ2 = QueryDef(
    "sql_tpch_q2",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT DISTINCT
                 CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
                 s_name, n_name, p_partkey, p_brand
               FROM v_part
               JOIN v_lineitem ON p_partkey = l_partkey
               JOIN v_supplier ON s_suppkey = l_suppkey
               JOIN v_nation   ON s_nationkey = n_nationkey
               JOIN v_region   ON n_regionkey = r_regionkey
               WHERE p_size <= 25 AND p_type = 'LARGE' AND r_name = 'ASIA'
                 AND CAST(round(s_acctbal * 100) AS BIGINT) = (
                   SELECT min(CAST(round(s2.s_acctbal * 100) AS BIGINT))
                   FROM v_supplier s2
                   JOIN v_lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                   JOIN v_nation n2   ON s2.s_nationkey = n2.n_nationkey
                   JOIN v_region r2   ON n2.n_regionkey = r2.r_regionkey
                   WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
               ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
               LIMIT 100""")
    },
    Some("""SELECT DISTINCT
              CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
              s_name, n_name, p_partkey, p_brand
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE p_size <= 25 AND p_type = 'LARGE' AND r_name = 'ASIA'
              AND CAST(round(s_acctbal * 100) AS BIGINT) = (
                SELECT min(CAST(round(s2.s_acctbal * 100) AS BIGINT))
                FROM supplier s2
                JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
                JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
                WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
            ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
            LIMIT 100"""))

  /** TPC-H Q7 shape (volume shipping between two trading blocs): an
    * eight-table join with nation AND region each joined twice under
    * different aliases, a disjunctive symmetric bloc-pair predicate
    * (regions rather than Q7's literal nations — the synthetic data's
    * 25 nations make a single nation pair empty at sf0.001), and a
    * year-grouped revenue — revenue stays in exact 10⁻⁴-dollar integer
    * units so no division or float sum exists anywhere. */
  private val sqlTpchQ7 = QueryDef(
    "sql_tpch_q7",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT supp_nation, cust_nation, l_year,
                 CAST(sum(volume_u) AS BIGINT) AS revenue_u
               FROM (SELECT n1.n_name AS supp_nation,
                       n2.n_name AS cust_nation,
                       year(l_shipdate) AS l_year,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS volume_u
                     FROM v_supplier
                     JOIN v_lineitem  ON s_suppkey = l_suppkey
                     JOIN v_orders    ON o_orderkey = l_orderkey
                     JOIN v_customer  ON c_custkey = o_custkey
                     JOIN v_nation n1 ON s_nationkey = n1.n_nationkey
                     JOIN v_region r1 ON n1.n_regionkey = r1.r_regionkey
                     JOIN v_nation n2 ON c_nationkey = n2.n_nationkey
                     JOIN v_region r2 ON n2.n_regionkey = r2.r_regionkey
                     WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
                         OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
                       AND l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate <  TIMESTAMP '1998-01-01') shipping
               GROUP BY supp_nation, cust_nation, l_year
               ORDER BY supp_nation, cust_nation, l_year""")
    },
    Some("""SELECT supp_nation, cust_nation, l_year,
              CAST(sum(volume_u) AS BIGINT) AS revenue_u
            FROM (SELECT n1.n_name AS supp_nation,
                    n2.n_name AS cust_nation,
                    CAST(year(l_shipdate) AS INTEGER) AS l_year,
                    CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      AS volume_u
                  FROM supplier
                  JOIN lineitem  ON s_suppkey = l_suppkey
                  JOIN orders    ON o_orderkey = l_orderkey
                  JOIN customer  ON c_custkey = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
                  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                  WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
                      OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
                    AND l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l_shipdate <  TIMESTAMP '1998-01-01') shipping
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H Q8 shape (national market share): an eight-table join
    * (nation twice, region once) feeding a conditional-sum-over-sum
    * ratio per year. The share is computed as exact integer basis
    * points via floor division (`DIV` ↔ `//`) — both engines divide
    * the SAME exact integers, so no float ratio can diverge in the
    * last ulp. Spark accumulates in DECIMAL(38,0) (mirroring DuckDB's
    * automatic HUGEINT sum), so the ×10000 share multiplier keeps
    * exactness headroom at any scale factor instead of meeting Long
    * overflow around sf60. */
  private val sqlTpchQ8 = QueryDef(
    "sql_tpch_q8",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT o_year,
                 CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume_u
                               ELSE 0 END) * 10000
                      DIV sum(volume_u) AS BIGINT) AS mkt_share_bp,
                 CAST(sum(volume_u) AS BIGINT) AS total_volume_u
               FROM (SELECT year(o_orderdate) AS o_year,
                       CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS DECIMAL(38, 0)) AS volume_u,
                       n2.n_name AS nation
                     FROM v_part
                     JOIN v_lineitem  ON p_partkey = l_partkey
                     JOIN v_supplier  ON s_suppkey = l_suppkey
                     JOIN v_orders    ON l_orderkey = o_orderkey
                     JOIN v_customer  ON o_custkey = c_custkey
                     JOIN v_nation n1 ON c_nationkey = n1.n_nationkey
                     JOIN v_region    ON n1.n_regionkey = r_regionkey
                     JOIN v_nation n2 ON s_nationkey = n2.n_nationkey
                     WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') all_nations
               GROUP BY o_year
               ORDER BY o_year""")
    },
    Some("""SELECT o_year,
              CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume_u
                            ELSE 0 END) * 10000
                   // sum(volume_u) AS BIGINT) AS mkt_share_bp,
              CAST(sum(volume_u) AS BIGINT) AS total_volume_u
            FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                    CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      AS volume_u,
                    n2.n_name AS nation
                  FROM part
                  JOIN lineitem  ON p_partkey = l_partkey
                  JOIN supplier  ON s_suppkey = l_suppkey
                  JOIN orders    ON l_orderkey = o_orderkey
                  JOIN customer  ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region    ON n1.n_regionkey = r_regionkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
                  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') all_nations
            GROUP BY o_year
            ORDER BY o_year"""))

  /** TPC-H Q9 shape (product-type profit): LIKE-filtered part join,
    * profit = discounted revenue minus a list-cost term (p_retailprice
    * × quantity stands in for ps_supplycost), grouped by supplier
    * nation and order year. Both terms are exact 10⁻⁴-dollar BIGINTs;
    * the subtraction and sum never touch floats. */
  private val sqlTpchQ9 = QueryDef(
    "sql_tpch_q9",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT nation, o_year, CAST(sum(amount_u) AS BIGINT) AS sum_profit_u
               FROM (SELECT n_name AS nation,
                       year(o_orderdate) AS o_year,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       - CAST(round(p_retailprice * 100) AS BIGINT) * 100
                         * CAST(round(l_quantity) AS BIGINT) AS amount_u
                     FROM v_part
                     JOIN v_lineitem ON p_partkey = l_partkey
                     JOIN v_supplier ON s_suppkey = l_suppkey
                     JOIN v_orders   ON o_orderkey = l_orderkey
                     JOIN v_nation   ON s_nationkey = n_nationkey
                     WHERE p_name LIKE '%widget%') profit
               GROUP BY nation, o_year
               ORDER BY nation, o_year DESC""")
    },
    Some("""SELECT nation, o_year, CAST(sum(amount_u) AS BIGINT) AS sum_profit_u
            FROM (SELECT n_name AS nation,
                    CAST(year(o_orderdate) AS INTEGER) AS o_year,
                    CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    - CAST(round(p_retailprice * 100) AS BIGINT) * 100
                      * CAST(round(l_quantity) AS BIGINT) AS amount_u
                  FROM part
                  JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  WHERE p_name LIKE '%widget%') profit
            GROUP BY nation, o_year
            ORDER BY nation, o_year DESC"""))

  /** TPC-H Q11 shape (important stock identification): group-by with a
    * HAVING threshold that is an UNCORRELATED scalar aggregate over
    * the same filtered join — Catalyst evaluates it once as a
    * subquery stage and broadcasts the scalar into the filter. The
    * 0.1 % fraction is expressed by multiplying the group sum by 1000
    * instead of dividing the total, so the comparison is exact integer
    * against exact integer — accumulated in DECIMAL(38,0) on the
    * Spark side (DuckDB sums to HUGEINT automatically), so the ×1000
    * never meets Long overflow at any scale factor. */
  private val sqlTpchQ11 = QueryDef(
    "sql_tpch_q11",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT l_partkey, CAST(sum(val_u) AS BIGINT) AS value_u
               FROM (SELECT l_partkey,
                       CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_quantity) AS BIGINT)
                         AS DECIMAL(38, 0)) AS val_u
                     FROM v_lineitem
                     JOIN v_supplier ON s_suppkey = l_suppkey
                     JOIN v_nation   ON s_nationkey = n_nationkey
                     WHERE n_name = 'NATION_3') t
               GROUP BY l_partkey
               HAVING sum(val_u) * 1000 > (
                 SELECT sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round(l_quantity) AS BIGINT)
                            AS DECIMAL(38, 0)))
                 FROM v_lineitem
                 JOIN v_supplier ON s_suppkey = l_suppkey
                 JOIN v_nation   ON s_nationkey = n_nationkey
                 WHERE n_name = 'NATION_3')
               ORDER BY value_u DESC, l_partkey""")
    },
    Some("""SELECT l_partkey, CAST(sum(val_u) AS BIGINT) AS value_u
            FROM (SELECT l_partkey,
                    CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT) AS val_u
                  FROM lineitem
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  WHERE n_name = 'NATION_3') t
            GROUP BY l_partkey
            HAVING sum(val_u) * 1000 > (
              SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_quantity) AS BIGINT))
              FROM lineitem
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3')
            ORDER BY value_u DESC, l_partkey"""))

  /** TPC-H Q12 shape (shipping-mode priority counting): join with a
    * row-vs-row date condition (shipped > 45 days after ITS order
    * date — the data's late-shipment analog of commit/receipt dates),
    * then conditional CASE counts per class. l_returnflag stands in
    * for l_shipmode. */
  private val sqlTpchQ12 = QueryDef(
    "sql_tpch_q12",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT l_returnflag AS ship_class,
                 CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                 CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
               FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
               WHERE l_shipdate > o_orderdate + INTERVAL 45 DAYS
                 AND l_shipdate >= TIMESTAMP '1997-01-01'
                 AND l_shipdate <  TIMESTAMP '1999-01-01'
               GROUP BY l_returnflag
               ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag AS ship_class,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1999-01-01'
            GROUP BY l_returnflag
            ORDER BY l_returnflag"""))

  /** TPC-H Q14 shape (promotion effect): single-row conditional-share
    * aggregate — promo revenue over total revenue for one ship-date
    * window, as exact integer basis points via BIGINT floor division
    * (same `DIV` ↔ `//` pairing as Q8). */
  private val sqlTpchQ14 = QueryDef(
    "sql_tpch_q14",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume_u
                               ELSE 0 END) * 10000
                      DIV sum(volume_u) AS BIGINT) AS promo_share_bp,
                 CAST(sum(volume_u) AS BIGINT) AS revenue_u
               FROM (SELECT p_type,
                       CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS DECIMAL(38, 0)) AS volume_u
                     FROM v_lineitem JOIN v_part ON l_partkey = p_partkey
                     WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                       AND l_shipdate <  TIMESTAMP '1998-07-01') t""")
    },
    Some("""SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume_u
                            ELSE 0 END) * 10000
                   // sum(volume_u) AS BIGINT) AS promo_share_bp,
              CAST(sum(volume_u) AS BIGINT) AS revenue_u
            FROM (SELECT p_type,
                    CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      AS volume_u
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                    AND l_shipdate <  TIMESTAMP '1998-07-01') t"""))

  /** TPC-H Q15 shape (top supplier): a WITH-clause revenue view used
    * twice — once joined, once under an uncorrelated scalar MAX — so
    * the planner must either reuse or re-derive the CTE; revenue is
    * exact integer units end-to-end, making the MAX-equality safe. */
  private val sqlTpchQ15 = QueryDef(
    "sql_tpch_q15",
    (s, d) => {
      withViews(s, d)
      s.sql("""WITH revenue AS (
                 SELECT l_suppkey AS supplier_no,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS total_revenue_u
                 FROM v_lineitem
                 WHERE l_shipdate >= TIMESTAMP '1999-01-01'
                   AND l_shipdate <  TIMESTAMP '1999-04-01'
                 GROUP BY l_suppkey)
               SELECT s_suppkey, s_name, total_revenue_u
               FROM v_supplier JOIN revenue ON s_suppkey = supplier_no
               WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM revenue)
               ORDER BY s_suppkey""")
    },
    Some("""WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS total_revenue_u
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1999-01-01'
                AND l_shipdate <  TIMESTAMP '1999-04-01'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue_u
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM revenue)
            ORDER BY s_suppkey"""))

  /** TPC-H Q16 shape (supplier relationship count): COUNT(DISTINCT)
    * per attribute triple with an IN-list on p_size and a NOT IN
    * anti-subquery excluding flagged suppliers (negative balance
    * stands in for the complaints LIKE filter). */
  private val sqlTpchQ16 = QueryDef(
    "sql_tpch_q16",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT p_brand, p_type, p_size,
                 CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
               FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
               WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
                 AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
                 AND l_suppkey NOT IN (
                   SELECT s_suppkey FROM v_supplier WHERE s_acctbal < 0)
               GROUP BY p_brand, p_type, p_size
               ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    },
    Some("""SELECT p_brand, p_type, p_size,
              CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
              AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
              AND l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    * OR-of-conjunct-groups filter that stresses predicate
    * normalization — Catalyst extracts the common `p_size >= 1` /
    * join-key conjuncts from the disjunction so the join does not
    * degrade to a filter-after-cross. Single-row exact-integer
    * output. */
  private val sqlTpchQ19 = QueryDef(
    "sql_tpch_q19",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS BIGINT) AS revenue_u
               FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
               WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                      AND l_quantity >= 1 AND l_quantity <= 20)
                  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                      AND l_quantity >= 10 AND l_quantity <= 30)
                  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                      AND l_quantity >= 20 AND l_quantity <= 40)""")
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS BIGINT) AS revenue_u
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                   AND l_quantity >= 1 AND l_quantity <= 20)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                   AND l_quantity >= 10 AND l_quantity <= 30)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                   AND l_quantity >= 20 AND l_quantity <= 40)"""))

  /** TPC-H Q20 shape (potential part promotion): an IN-subquery whose
    * body is a grouped join filtered by a CORRELATED scalar aggregate
    * — "suppliers who shipped more than half of a small part's total
    * quantity in 1999" (the availqty > 0.5·sum threshold re-expressed
    * over lineitem-as-partsupp). The half threshold is `2·qty > sum`,
    * exact BIGINT both sides. */
  private val sqlTpchQ20 = QueryDef(
    "sql_tpch_q20",
    (s, d) => {
      withViews(s, d)
      s.sql("""SELECT s_name, n_name
               FROM v_supplier JOIN v_nation ON s_nationkey = n_nationkey
               WHERE s_suppkey IN (
                 SELECT g.l_suppkey FROM (
                   SELECT l_suppkey, l_partkey,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
                   FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
                   WHERE p_type = 'SMALL'
                     AND l_shipdate >= TIMESTAMP '1999-01-01'
                     AND l_shipdate <  TIMESTAMP '2000-01-01'
                   GROUP BY l_suppkey, l_partkey) g
                 WHERE 2 * g.qty > (
                   SELECT CAST(sum(CAST(round(l2.l_quantity) AS BIGINT)) AS BIGINT)
                   FROM v_lineitem l2
                   WHERE l2.l_partkey = g.l_partkey
                     AND l2.l_shipdate >= TIMESTAMP '1999-01-01'
                     AND l2.l_shipdate <  TIMESTAMP '2000-01-01'))
               ORDER BY s_name""")
    },
    Some("""SELECT s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
              SELECT g.l_suppkey FROM (
                SELECT l_suppkey, l_partkey,
                  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_type = 'SMALL'
                  AND l_shipdate >= TIMESTAMP '1999-01-01'
                  AND l_shipdate <  TIMESTAMP '2000-01-01'
                GROUP BY l_suppkey, l_partkey) g
              WHERE 2 * g.qty > (
                SELECT CAST(sum(CAST(round(l2.l_quantity) AS BIGINT)) AS BIGINT)
                FROM lineitem l2
                WHERE l2.l_partkey = g.l_partkey
                  AND l2.l_shipdate >= TIMESTAMP '1999-01-01'
                  AND l2.l_shipdate <  TIMESTAMP '2000-01-01'))
            ORDER BY s_name"""))

  /** RECURSIVE CTE (r10): `WITH RECURSIVE` lands in Spark 4.x as the
    * `UnionLoop` operator — the anchor seeds the working set, the
    * recursive leg re-executes against the previous iteration until
    * empty. The walk here divides each part key by 2 until it reaches
    * 1 (a pointer-chase to the root of an implicit binary hierarchy —
    * the relational shape of BOM explosions and org-chart rollups),
    * then histograms the chain depths. Iteration count is
    * log2(max key) — bounded and partition-parallel per step; DuckDB
    * runs the identical recursion as the oracle. */
  private val sqlRecursiveCte = QueryDef(
    "sql_recursive_cte",
    (s, d) => {
      withViews(s, d)
      s.sql("""WITH RECURSIVE chain AS (
                 SELECT p_partkey AS node, p_partkey AS cur,
                   CAST(0 AS BIGINT) AS depth
                 FROM v_part
                 UNION ALL
                 SELECT node, cur div 2, depth + 1 FROM chain WHERE cur > 1)
               SELECT depth, count(*) AS n FROM chain WHERE cur = 1
               GROUP BY depth ORDER BY depth""")
    },
    Some("""WITH RECURSIVE chain AS (
              SELECT p_partkey AS node, p_partkey AS cur,
                CAST(0 AS BIGINT) AS depth
              FROM part
              UNION ALL
              SELECT node, cur // 2, depth + 1 FROM chain WHERE cur > 1)
            SELECT depth, CAST(count(*) AS BIGINT) AS n FROM chain
            WHERE cur = 1 GROUP BY depth ORDER BY depth"""))

  val defs: Seq[QueryDef] = Seq(
    subqueryScalar, subqueryIn, subqueryExists, subqueryNotIn,
    sqlLateralTopn, sqlTpchQ2, sqlTpchQ3, sqlTpchQ4, sqlTpchQ5,
    sqlTpchQ6, sqlTpchQ7, sqlTpchQ8, sqlTpchQ9, sqlTpchQ10,
    sqlTpchQ11, sqlTpchQ12, sqlTpchQ13, sqlTpchQ14, sqlTpchQ15,
    sqlTpchQ16, sqlTpchQ17, sqlTpchQ18, sqlTpchQ19, sqlTpchQ20,
    sqlTpchQ21, sqlTpchQ22, groupingSets, sqlRecursiveCte)
}
