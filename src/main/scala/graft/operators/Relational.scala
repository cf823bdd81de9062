package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans, projection/filter, joins, aggregation,
  * sort/limit, set operations (SURVEY.md §2a–§2d, §2f).
  *
  * Design rules applied throughout (SURVEY.md §4, §5):
  *  - declarative DataFrame plans only, so Catalyst gets predicate
  *    pushdown / column pruning / join selection for free;
  *  - `broadcast()` hints only on true dimension tables
  *    (region/nation: 5/25 rows at every SF);
  *  - every oracle-checked query ends in a total ORDER BY over a
  *    unique key set, aggregated doubles are `round(.., n)` on BOTH
  *    engines, counts are exact BIGINT on both sides.
  */
object Relational {

  // ---- 2a. sources / sinks -------------------------------------------------

  private val scanParquet = QueryDef(
    "scan_parquet",
    (s, d) => Tables.region(s, d).orderBy("r_regionkey"),
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  /** Column-pruned scan: only 3 of 11 lineitem columns must reach the
    * parquet reader (ReadSchema assertion in RelationalSpec). */
  private val scanProjected = QueryDef(
    "scan_projected",
    (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** The Kinesis record-decode step: JSON payload column → typed field. */
  private val jsonIngest = QueryDef(
    "json_ingest",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
    Some("""SELECT event_id, user_id,
              CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events ORDER BY event_id"""))

  /** Parquet sink round-trip: write a filtered slice, read it back,
    * aggregate — proves the write path end-to-end, oracle on the
    * logical result. */
  private val sinkParquet = QueryDef(
    "sink_parquet",
    (s, d) => {
      // fixed location + overwrite: repeated runs reuse the directory
      // instead of accumulating copies in /tmp
      val tmp = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_sink_roundtrip").toString
      val out = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 25)
      out.write.mode("overwrite").parquet(tmp)
      // read back with the written schema supplied (identical to what
      // footer inference returns for these all-nullable columns) —
      // skips a schema-inference pass per run (r18, LoadFloorProbe)
      s.read.schema(out.schema).parquet(tmp)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sc"))
        .select(col("l_returnflag"), col("n"),
          round(col("sc").cast("double") / 100, 2).as("revenue"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
              round(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS DOUBLE) / 100, 2) AS revenue
            FROM lineitem WHERE l_quantity >= 25
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---- 2b. projection / filter --------------------------------------------

  private val projectExpr = QueryDef(
    "project_expr",
    (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        when(col("l_quantity") > 25, "bulk").otherwise("small").as("qty_class"))
        .orderBy("l_orderkey", "l_linenumber", "net_price", "qty_class"),
    Some("""SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS net_price,
              CASE WHEN l_quantity > 25 THEN 'bulk' ELSE 'small' END AS qty_class
            FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, qty_class"""))

  /** Conjunctive predicates + BETWEEN + IN; all Column predicates so
    * parquet PushedFilters fires (plan assertion in RelationalSpec). */
  private val filterPred = QueryDef(
    "filter_pred",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_quantity").between(5, 10) &&
          col("l_discount") > 0.02 &&
          col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem
            WHERE l_quantity BETWEEN 5 AND 10 AND l_discount > 0.02
              AND l_returnflag IN ('A', 'R')
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount"""))

  private val filterString = QueryDef(
    "filter_string",
    (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_name").rlike("[13579]$") && col("c_mktsegment").startsWith("B"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE regexp_matches(c_name, '[13579]$') AND c_mktsegment LIKE 'B%'
            ORDER BY c_custkey"""))

  // ---- 2c. joins -----------------------------------------------------------

  /** Large⋈large equi join (orders⋈lineitem): both sides shuffle on
    * the join key; at 100 TB this is the bucketed / co-partitioned
    * join — the key choice (orderkey) matches the natural layout.
    *
    * The per-order aggregate is pushed BELOW the join (Catalyst does
    * not do this rewrite itself): lineitem collapses 4:1 to one row
    * per orderkey before joining, so the join probes 150 k rows
    * instead of 600 k and the aggregation shuffle doubles as the join
    * shuffle. Same result, one less wide shuffle — the kind of rewrite
    * that matters most at 100 TB. */
  private val joinInnerHash = QueryDef(
    "join_inner_hash",
    (s, d) => {
      val perOrder = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
             sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sc"))
      Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
        .join(perOrder, "o_orderkey")
        .select(col("o_orderkey"), col("o_orderstatus"), col("n_items"),
          round(col("sc").cast("double") / 100, 2).as("revenue"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, CAST(count(*) AS BIGINT) AS n_items,
              round(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS DOUBLE) / 100, 2) AS revenue
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderstatus ORDER BY o_orderkey"""))

  /** Dim-table enrich: explicit broadcast() on nation/region (25/5 rows
    * at EVERY scale factor — true dims, safe to broadcast at 100 TB). */
  private val joinBroadcast = QueryDef(
    "join_broadcast",
    (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
             sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("sc"))
        .select(col("r_name"), col("n_name"), col("n_cust"),
          round(col("sc").cast("double") / col("n_cust") / 100, 2).as("avg_bal"))
        .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
              round(CAST(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / CAST(count(*) AS BIGINT) / 100, 2) AS avg_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  private val joinLeftOuter = QueryDef(
    "join_left_outer",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
               lit(0L)).as("sc"))
        .select(col("c_custkey"), col("n_orders"),
          round(col("sc").cast("double") / 100, 2).as("spend"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
              round(CAST(CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
                    AS BIGINT) AS DOUBLE) / 100, 2) AS spend
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey ORDER BY c_custkey"""))

  /** Full outer with unmatched rows guaranteed on BOTH sides: event
    * users (ids 0..~149) vs customers restricted to custkey >= 100. */
  private val joinFullOuter = QueryDef(
    "join_full_outer",
    (s, d) => {
      val byUser = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
      val cust = Tables.customer(s, d)
        .filter(col("c_custkey") >= 100)
        .select("c_custkey", "c_acctbal")
      byUser.join(cust, col("user_id") === col("c_custkey"), "full")
        .select(
          coalesce(col("user_id"), col("c_custkey")).as("id"),
          col("n_events"), col("c_acctbal"))
        .orderBy("id")
    },
    Some("""SELECT coalesce(user_id, c_custkey) AS id, n_events, c_acctbal
            FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
                  FROM events GROUP BY user_id) e
            FULL OUTER JOIN
                 (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_custkey >= 100) c
            ON user_id = c_custkey
            ORDER BY id"""))

  private val joinSemi = QueryDef(
    "join_semi",
    (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
            ORDER BY c_custkey"""))

  private val joinAnti = QueryDef(
    "join_anti",
    (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(
            col("o_orderstatus") === "F" &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
                                AND o_orderdate < TIMESTAMP '1996-01-01')
            ORDER BY c_custkey"""))

  /** Non-equi band join: value → [lo, hi) bucket. The band table is a
    * handful of rows → Spark picks BroadcastNestedLoopJoin, the right
    * physical plan for tiny×large theta joins at any scale. */
  private val joinRangeTheta = QueryDef(
    "join_range_theta",
    (s, d) => {
      import s.implicits._
      val bands = Seq(
        (0.0, 50.0, "XS"), (50.0, 150.0, "S"),
        (150.0, 300.0, "M"), (300.0, 600.0, "L")).toDF("lo", "hi", "band")
      Tables.events(s, d)
        .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sc"))
        .select(col("band"), col("n"),
          round(col("sc").cast("double") / 100, 2).as("sum_value"))
        .orderBy("band")
    },
    Some("""SELECT band, CAST(count(*) AS BIGINT) AS n,
              round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS sum_value
            FROM events
            JOIN (VALUES (0.0, 50.0, 'XS'), (50.0, 150.0, 'S'),
                         (150.0, 300.0, 'M'), (300.0, 600.0, 'L')) b(lo, hi, band)
              ON value >= lo AND value < hi
            GROUP BY band ORDER BY band"""))

  /** Skew-aware SALTED join — the join-side twin of agg_salted. When
    * one join key is hot (a viral document, a default user id), a
    * plain shuffle join lands the whole hot key in ONE task; salting
    * splits it: the fact side gets a deterministic salt in [0, 8)
    * derived from non-key columns, the dimension side is replicated
    * once per salt value (an 8× blowup of the SMALL side only), and
    * the join key becomes (key, salt) — every hot key now spreads
    * over 8 tasks. The shuffle-hash hint keeps the demo honest: the
    * dimension would otherwise broadcast at this scale and hide the
    * skew mechanics being demonstrated. Result is provably identical
    * to the unsalted join — exactly what the oracle checks. */
  private val joinSalted = QueryDef(
    "join_salted",
    (s, d) => {
      val nSalt = 8
      val facts = Tables.lineitem(s, d)
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(nSalt)))
      val dim = Tables.part(s, d)
        .withColumn("salt", explode(expr(s"sequence(0, ${nSalt - 1})")))
      facts
        .join(dim.hint("shuffle_hash"),
          facts("l_partkey") === dim("p_partkey") &&
          facts("salt") === dim("salt"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
             sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sum_qty"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  private val joinCross = QueryDef(
    "join_cross",
    (s, d) =>
      Tables.region(s, d).select("r_name")
        .crossJoin(Tables.customer(s, d).select("c_mktsegment").distinct())
        .orderBy("r_name", "c_mktsegment"),
    Some("""SELECT r_name, c_mktsegment
            FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
            ORDER BY r_name, c_mktsegment"""))

  // ---- 2d. aggregation -----------------------------------------------------

  private val aggGlobal = QueryDef(
    "agg_global",
    (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sq"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sp"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))
        .select(
          col("n_rows"),
          col("sq").cast("double").as("sum_qty"),
          round(col("sp").cast("double") / col("n_rows") / 100, 2).as("avg_price"),
          col("min_price"), col("max_price")),
    Some("""SELECT n_rows, CAST(sq AS DOUBLE) AS sum_qty,
              round(CAST(sp AS DOUBLE) / n_rows / 100, 2) AS avg_price,
              min_price, max_price
            FROM (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
                    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sp,
                    min(l_extendedprice) AS min_price,
                    max(l_extendedprice) AS max_price
                  FROM lineitem)"""))

  /** Flagship: TPC-H Q1-shape pricing summary (SURVEY.md §7 M0).
    * Map-side partial aggregation + 6-group final — the canonical
    * "keyed counters" capability of the reference class. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .withColumn("qty_i", expr("CAST(round(l_quantity) AS BIGINT)"))
      .withColumn("price_c", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .withColumn("disc_c", expr("CAST(round(l_discount * 100) AS BIGINT)"))
      .withColumn("tax_c", expr("CAST(round(l_tax * 100) AS BIGINT)"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty_i")).as("sq"),
        sum(col("price_c")).as("sp"),
        sum(col("price_c") * (lit(100L) - col("disc_c"))).as("sd"),
        sum(col("price_c") * (lit(100L) - col("disc_c")) * (lit(100L) + col("tax_c"))).as("sch"),
        sum(col("disc_c")).as("sdisc"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("sq").cast("double").as("sum_qty"),
        round(col("sp").cast("double") / 100, 2).as("sum_base_price"),
        round(col("sd").cast("double") / 10000, 2).as("sum_disc_price"),
        round(col("sch").cast("double") / 1000000, 2).as("sum_charge"),
        round(col("sq").cast("double") / col("count_order"), 2).as("avg_qty"),
        round(col("sp").cast("double") / col("count_order") / 100, 2).as("avg_price"),
        round(col("sdisc").cast("double") / col("count_order") / 100, 4).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val aggGroupBy = QueryDef(
    "agg_groupby",
    (s, d) => q1PricingSummary(s, d),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(sq AS DOUBLE) AS sum_qty,
              round(CAST(sp AS DOUBLE) / 100, 2) AS sum_base_price,
              round(CAST(sd AS DOUBLE) / 10000, 2) AS sum_disc_price,
              round(CAST(sch AS DOUBLE) / 1000000, 2) AS sum_charge,
              round(CAST(sq AS DOUBLE) / count_order, 2) AS avg_qty,
              round(CAST(sp AS DOUBLE) / count_order / 100, 2) AS avg_price,
              round(CAST(sdisc AS DOUBLE) / count_order / 100, 4) AS avg_disc,
              count_order
            FROM (SELECT l_returnflag, l_linestatus,
                    CAST(sum(qty_i) AS BIGINT) AS sq,
                    CAST(sum(price_c) AS BIGINT) AS sp,
                    CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sd,
                    CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS BIGINT) AS sch,
                    CAST(sum(disc_c) AS BIGINT) AS sdisc,
                    CAST(count(*) AS BIGINT) AS count_order
                  FROM (SELECT l_returnflag, l_linestatus,
                          CAST(round(l_quantity) AS BIGINT) AS qty_i,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                          CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
                          CAST(round(l_tax * 100) AS BIGINT) AS tax_c
                        FROM lineitem
                        WHERE l_shipdate <= TIMESTAMP '2000-09-02')
                  GROUP BY l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus"""))

  private val aggHaving = QueryDef(
    "agg_having",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
             sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sc"))
        .filter(col("n_orders") >= 14)
        .select(col("o_custkey"), col("n_orders"),
          round(col("sc").cast("double") / 100, 2).as("spend"))
        .orderBy("o_custkey"),
    Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
              round(CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS spend
            FROM orders GROUP BY o_custkey HAVING count(*) >= 14
            ORDER BY o_custkey"""))

  private val aggCountDistinct = QueryDef(
    "agg_count_distinct",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** HLL++ sketch — mergeable, constant memory per group: the 100 TB
    * path for distinct-user counts. The sketch value itself is
    * engine-specific, so the oracle checks the validated property
    * instead: the HLL estimate (rsd 2%) must land within 5% of the
    * exact count, which DuckDB asserts as a constant TRUE next to the
    * exact count it computes itself. Deterministic: HLL on a fixed
    * dataset always yields the same estimate. */
  private val aggApproxDistinct = QueryDef(
    "agg_approx_distinct",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(
          col("event_type"),
          col("exact_users"),
          (abs(col("approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("approx_within_5pct"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
              TRUE AS approx_within_5pct
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Mergeable HLL sketches (Spark 4 Datasketches surface) — the
    * incremental-uniques pattern a 100 TB pipeline actually needs:
    * build one `hll_sketch_agg` sketch PER SHARD (in production these
    * are persisted per day/partition), then `hll_union_agg` merges the
    * binary sketches and estimates the global distinct count without
    * ever re-touching the raw data. Register-wise max makes the merge
    * exact: union of shard sketches ≡ the sketch of the union (asserted
    * in RelationalSpec). Sharding here is on the key itself
    * (user_id % 4), so per-shard exact distincts are disjoint and
    * their sum is the exact global count — giving the oracle an exact
    * anchor in the same single pipeline. Sketch bytes are
    * engine-specific ⇒ graded by the agg_approx_distinct pattern:
    * estimate within 5% of exact, DuckDB asserts constant TRUE. */
  private val aggHllMergeable = QueryDef(
    "agg_hll_mergeable",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("shard", col("user_id") % 4)
        .groupBy("event_type", "shard")
        .agg(
          expr("hll_sketch_agg(user_id, 12)").as("sk"),
          countDistinct(col("user_id")).as("ex"))
        .groupBy("event_type")
        .agg(
          expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"),
          sum("ex").as("exact_users"),
          count(lit(1)).as("n_shards"))
        .select(
          col("event_type"),
          col("exact_users"),
          col("n_shards"),
          (abs(col("est") - col("exact_users")) <=
            col("exact_users") * 0.05).as("merged_within_5pct"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
              CAST(count(DISTINCT user_id % 4) AS BIGINT) AS n_shards,
              TRUE AS merged_within_5pct
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Heavy-hitter sketch (`approx_top_k`, Datasketches frequent-items)
    * — completes the mergeable-sketch family next to HLL
    * (agg_hll_mergeable) and quantiles (agg_percentile_approx): the
    * 100 TB top-N-per-key plan when exact two-phase counting
    * (llm_text_stats) is too hot. Grading honors the sketch contract:
    * the ORDER of returned items under count ties is sketch-internal,
    * so membership is not graded; instead every returned estimate is
    * joined back to the exact per-item count and must match it exactly
    * (capacity 8192 ≥ per-group cardinality ⇒ the sketch never evicts
    * and its estimates are exact; past capacity the guarantee relaxes
    * to ±εN). DuckDB asserts the boolean as TRUE beside the exact
    * top count it computes itself. */
  private val aggApproxTopk = QueryDef(
    "agg_approx_topk",
    (s, d) => {
      val ev = Tables.events(s, d)
      val est = ev.groupBy("event_type")
        .agg(expr("approx_top_k(user_id, 3, 8192)").as("tk"))
        .select(col("event_type"), explode(col("tk")).as("e"))
        .select(col("event_type"), col("e.item").as("user_id"),
          col("e.count").as("est"))
      val exact = ev.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("n"))
      est.join(exact, Seq("event_type", "user_id"), "left")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("k_returned"),
          max(col("n")).as("top_count"),
          (sum(when(col("est") === col("n"), 0L).otherwise(1L)) === 0L)
            .as("estimates_exact"))
        .orderBy("event_type")
    },
    // Oracle bounds: k_returned = least(3, distinct users) so groups
    // with < 3 users (possible at tiny SFs) still match; estimates are
    // exact only while per-group cardinality stays within the 8192
    // sketch capacity — RelationalSpec asserts that precondition so an
    // SF bump fails loudly at the assertion, not as a hash mismatch.
    Some("""SELECT event_type,
              CAST(least(3, count(*)) AS BIGINT) AS k_returned,
              CAST(max(n) AS BIGINT) AS top_count,
              TRUE AS estimates_exact
            FROM (SELECT event_type, user_id, count(*) AS n
                  FROM events GROUP BY event_type, user_id)
            GROUP BY event_type ORDER BY event_type"""))

  /** Conditional aggregation via the SQL-standard FILTER clause (and
    * count_if) — several conditional aggregates in ONE pass instead of
    * self-joins or pivot gymnastics; each FILTER aggregate is still a
    * partial-aggregatable two-phase HashAggregate. */
  private val aggFiltered = QueryDef(
    "agg_filtered",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          count(lit(1)).as("n_all"),
          expr("CAST(count_if(l_returnflag = 'R') AS BIGINT)").as("n_returned"),
          expr("""CAST(sum(CAST(round(l_quantity) AS BIGINT))
                  FILTER (WHERE l_discount > 0.05) AS BIGINT)""")
            .as("qty_discounted"),
          expr("""CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT)""")
            .as("n_bulk"))
        .orderBy("l_linestatus"),
    Some("""SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_all,
              CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_returned,
              CAST(sum(CAST(round(l_quantity) AS BIGINT))
                   FILTER (WHERE l_discount > 0.05) AS BIGINT) AS qty_discounted,
              CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk
            FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** EXACT distinct counting the mergeable way: Spark's bitmap
    * aggregate family (3.5+) buckets each id into a 32k-bit bitmap
    * page, ORs pages per (group, bucket) map-side, then sums page
    * popcounts — an exact count with HLL's merge topology. At 100 TB
    * this is THE exact-distinct design: partials are fixed-size
    * bitmap pages (not id lists), every stage is mergeable, and the
    * shuffle carries one page per (group, bucket) instead of one row
    * per distinct id. Requires a non-negative id domain (user_id ≥ 0
    * here; id 0 is present in the data and verified). The oracle is a
    * plain COUNT(DISTINCT). */
  private val aggBitmapDistinct = QueryDef(
    "agg_bitmap_distinct",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bucket"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy("event_type", "bucket")
        .agg(expr("bitmap_construct_agg(pos)").as("page"))
        .groupBy("event_type")
        .agg(sum(expr("bitmap_count(page)")).as("n_users"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type"""))

  private val aggRollup = QueryDef(
    "agg_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(round(l_quantity) AS BIGINT)")).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
              coalesce(l_linestatus, 'ALL') AS status,
              CAST(count(*) AS BIGINT) AS n,
              CAST(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY flag, status"""))

  private val aggCubeSets = QueryDef(
    "agg_cube_sets",
    (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
             round(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
               .cast("double") / 100, 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority"),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              CAST(count(*) AS BIGINT) AS n,
              round(CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS total
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""))

  // ---- 2f. sort / limit / set ops -----------------------------------------

  private val sortMulti = QueryDef(
    "sort_multi",
    (s, d) =>
      Tables.customer(s, d)
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy(col("c_nationkey").asc, col("c_acctbal").desc, col("c_custkey").asc),
    Some("""SELECT c_custkey, c_nationkey, c_acctbal FROM customer
            ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey ASC"""))

  /** ORDER BY + LIMIT compiles to TakeOrderedAndProject: per-partition
    * top-K then a K-row merge on the driver — no global sort at scale. */
  private val topkGlobal = QueryDef(
    "topk_global",
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  private val setUnionAll = QueryDef(
    "set_union_all",
    (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"), lit("cust").as("src"))
        .unionByName(
          Tables.supplier(s, d).select(col("s_suppkey").as("k"), lit("supp").as("src")))
        .orderBy("src", "k"),
    Some("""SELECT c_custkey AS k, 'cust' AS src FROM customer
            UNION ALL SELECT s_suppkey AS k, 'supp' AS src FROM supplier
            ORDER BY src, k"""))

  private val setUnionDistinct = QueryDef(
    "set_union_distinct",
    (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k"),
    Some("""SELECT c_nationkey AS k FROM customer
            UNION SELECT s_nationkey AS k FROM supplier ORDER BY k"""))

  private val setIntersect = QueryDef(
    "set_intersect",
    (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("k"))
        .intersect(Tables.events(s, d).select(col("user_id").as("k")))
        .orderBy("k"),
    Some("""SELECT o_custkey AS k FROM orders
            INTERSECT SELECT user_id AS k FROM events ORDER BY k"""))

  private val setExcept = QueryDef(
    "set_except",
    (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("k")))
        .orderBy("k"),
    Some("""SELECT c_custkey AS k FROM customer
            EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
            ORDER BY k"""))

  /** EXCEPT ALL — BAG semantics: each value survives with multiplicity
    * max(count_left − count_right, 0), which `except` (set semantics)
    * cannot express. Catalyst plans it as a count-aggregate + replicate
    * (Expand), one shuffle per side — no row-identity join. Output is
    * grouped (the multiplicity per key) so the comparator sees a
    * deterministic total order. */
  private val setExceptAll = QueryDef(
    "set_except_all",
    (s, d) =>
      Tables.lineitem(s, d).select((col("l_orderkey") % 1000).as("k"))
        .exceptAll(
          Tables.orders(s, d).select((col("o_orderkey") % 1000).as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
    Some("""SELECT k, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT l_orderkey % 1000 AS k FROM lineitem
              EXCEPT ALL
              SELECT o_orderkey % 1000 AS k FROM orders)
            GROUP BY k ORDER BY k"""))

  val defs: Seq[QueryDef] = Seq(
    scanParquet, scanProjected, jsonIngest, sinkParquet,
    projectExpr, filterPred, filterString,
    joinInnerHash, joinBroadcast, joinLeftOuter, joinFullOuter,
    joinSemi, joinAnti, joinRangeTheta, joinSalted, joinCross,
    aggGlobal, aggGroupBy, aggHaving, aggCountDistinct, aggApproxDistinct,
    aggHllMergeable, aggApproxTopk, aggFiltered, aggBitmapDistinct,
    aggRollup, aggCubeSets,
    sortMulti, topkGlobal,
    setUnionAll, setUnionDistinct, setIntersect, setExcept, setExceptAll)
}
