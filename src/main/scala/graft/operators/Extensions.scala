package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 engine extensions beyond the SURVEY.md §2 contract: upsert
  * (MERGE-style), bucketed co-located joins, CSV source/sink
  * round-trip, statistical aggregates, and UNPIVOT — the remaining
  * surface a warehouse-style user of the reference's class would
  * expect from a complete engine.
  *
  * Determinism rules as everywhere (IMPLEMENTATION.md): money in exact
  * integer cents, total ORDER BY, epoch BIGINT timestamps; the one
  * exception is `agg_stats`, whose floating-point moments are rounded
  * to 3 decimals on both engines (the cross-engine summation-order
  * error is ~1e-10 relative, eight orders of magnitude below the
  * rounding grain).
  */
object Extensions {

  private def tmpPath(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"), name).toString

  /** orders as (key, status, exact price cents). */
  private def ordersCents(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"))

  /** MERGE-style upsert: base ⟗ delta on the key, delta wins; delta
    * carries both updates (existing keys, +1000.00) and inserts (new
    * keys). The full-outer hash merge is the canonical distributed
    * upsert plan — one shuffle on the key; at 100 TB the base side
    * would be a bucketed/partitioned table so only the delta moves. */
  private val mergeUpsert = QueryDef(
    "merge_upsert",
    (s, d) => {
      val base = ordersCents(s, d)
      val changed = base.filter(col("o_orderkey") % 100 === 0)
      val delta = changed
        .select(col("o_orderkey"), lit("U").as("u_st"),
          (col("pc") + 100000L).as("u_pc"))
        .unionByName(changed.select(
          (col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("N").as("u_st"), col("pc").as("u_pc")))
      base.join(delta, Seq("o_orderkey"), "full_outer")
        .select(
          col("o_orderkey"),
          coalesce(col("u_st"), col("o_orderstatus")).as("status"),
          coalesce(col("u_pc"), col("pc")).as("price_cents"))
        .orderBy("o_orderkey")
    },
    Some("""WITH base AS (
              SELECT o_orderkey, o_orderstatus,
                CAST(round(o_totalprice * 100) AS BIGINT) AS pc
              FROM orders),
            delta AS (
              SELECT o_orderkey, 'U' AS u_st, pc + 100000 AS u_pc
              FROM base WHERE o_orderkey % 100 = 0
              UNION ALL
              SELECT o_orderkey + 10000000, 'N', pc
              FROM base WHERE o_orderkey % 100 = 0)
            SELECT coalesce(d.o_orderkey, b.o_orderkey) AS o_orderkey,
              coalesce(d.u_st, b.o_orderstatus) AS status,
              CAST(coalesce(d.u_pc, b.pc) AS BIGINT) AS price_cents
            FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
            ORDER BY o_orderkey"""))

  /** Bucketed co-located join: both sides written as 8-bucket tables
    * on the join key, then joined via `spark.table` — the bucketed
    * scans satisfy the join's distribution requirement, so NO exchange
    * appears on either join input (plan-asserted in RelationalSpec).
    * This is THE 100 TB join strategy for repeatedly-joined fact
    * tables: the shuffle is paid once at write time, never per query. */
  private val joinBucketed = QueryDef(
    "join_bucketed",
    (s, d) => {
      ordersCents(s, d)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", tmpPath("graft_b_orders"))
        .saveAsTable("graft_b_orders")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ec"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", tmpPath("graft_b_lineitem"))
        .saveAsTable("graft_b_lineitem")
      s.table("graft_b_orders")
        .join(s.table("graft_b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"), sum("ec").as("sum_cents"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                AS sum_cents
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** CSV sink → source round trip: typed columns (BIGINT keys, cents,
    * epoch seconds) survive the text encode/decode bit-exactly; the
    * read-back side supplies an explicit schema (never inferSchema —
    * a schema inference pass over 100 TB is a full extra scan). */
  private val csvRoundtrip = QueryDef(
    "csv_roundtrip",
    (s, d) => {
      val out = tmpPath("graft_csv_rt")
      Tables.orders(s, d)
        .select(
          col("o_orderkey"), col("o_orderstatus"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"),
          unix_timestamp(col("o_orderdate")).as("od_epoch"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read
        .schema("o_orderkey BIGINT, o_orderstatus STRING, pc BIGINT, od_epoch BIGINT")
        .option("header", "true").csv(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("pc").as("sum_cents"),
          min("od_epoch").as("first_epoch"), max("od_epoch").as("last_epoch"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS sum_cents,
              CAST(min(floor(epoch(o_orderdate))) AS BIGINT) AS first_epoch,
              CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS last_epoch
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Statistical aggregates: sample stddev/variance, correlation and
    * covariance — the moment-sketch family. All are mergeable partial
    * aggregates (sum/sum-of-squares/co-moments cross the shuffle, not
    * rows), so the plan is the same two-phase HashAggregate as any
    * sum. Outputs rounded to 3 decimals on both engines. */
  private val aggStats = QueryDef(
    "agg_stats",
    (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("dc", expr("CAST(round(l_discount * 100) AS BIGINT)"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(stddev_samp(col("l_quantity")), 3).as("sd_qty"),
          round(var_samp(col("l_quantity")), 3).as("var_qty"),
          round(corr(col("l_quantity"), col("dc")), 3).as("corr_qty_disc"),
          round(covar_samp(col("l_quantity"), col("dc")), 3).as("cov_qty_disc"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
              round(stddev_samp(l_quantity), 3) AS sd_qty,
              round(var_samp(l_quantity), 3) AS var_qty,
              round(corr(l_quantity, dc), 3) AS corr_qty_disc,
              round(covar_samp(l_quantity, dc), 3) AS cov_qty_disc
            FROM (SELECT l_returnflag, l_quantity,
                    CAST(round(l_discount * 100) AS BIGINT) AS dc
                  FROM lineitem)
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** UNPIVOT (wide → long): per-flag metric columns melted into
    * (metric, value) rows via the Dataset.unpivot API — the inverse of
    * `agg_pivot`. Narrow op: no extra shuffle beyond the aggregate. */
  private val unpivotStack = QueryDef(
    "unpivot_stack",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(expr("CAST(l_quantity AS BIGINT)")).as("qty_sum"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("price_cents"),
          sum(expr("CAST(round(l_discount * 100) AS BIGINT)")).as("disc_cents"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("qty_sum"), col("price_cents"), col("disc_cents")),
          "metric", "value")
        .orderBy("l_returnflag", "metric"),
    Some("""WITH agg AS (
              SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                  AS price_cents,
                CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                  AS disc_cents
              FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, metric, value FROM (
              SELECT l_returnflag, 'qty_sum' AS metric, qty_sum AS value FROM agg
              UNION ALL
              SELECT l_returnflag, 'price_cents', price_cents FROM agg
              UNION ALL
              SELECT l_returnflag, 'disc_cents', disc_cents FROM agg)
            ORDER BY l_returnflag, metric"""))

  val defs: Seq[QueryDef] = Seq(
    mergeUpsert, joinBucketed, csvRoundtrip, aggStats, unpivotStack)
}
