package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-graph scale-up probe for the TPC-H surface: replicate BOTH
  * fact tables (lineitem + orders) N× with the same orderkey shift —
  * so every join stays key-consistent and fact-to-fact join
  * cardinality grows linearly, exactly as a bigger day of data would
  * — and measure the three join shapes the 100 TB claims rest on.
  *
  * The replicas are MATERIALIZED to scratch parquet before timing:
  * keeping them as a lazy 16-way union is not how bigger data arrives
  * (one table, more rows) and it distorts the plans — Catalyst pushes
  * joins/aggregates through Union, so a semi join against a lazy
  * union becomes 16 separate sort-merge joins and measures the
  * pushdown artifact, not the data scaling (observed directly: q18
  * 11.7 s lazy-union vs 2.9 s materialized at factor 16).
  *
  * The shapes:
  *
  *  - q3 : fact ⋈ fact ⋈ broadcast dim, grouped top-N
  *  - q18: grouped-HAVING semi join back onto the same fact
  *  - q8 : the full star — two facts shuffled once, five dims broadcast
  *
  * Near-linear wall-time growth with dims broadcast at every factor is
  * the pass signal; superlinear growth or a dim falling out of
  * broadcast would flag a plan that dies at 100×. Row counts are
  * asserted to scale exactly ×f so the timing cannot be bought with a
  * silently-wrong join.
  *
  * Usage: sbt "runMain graft.tools.JoinScaleProbe [maxFactor]"
  */
object JoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxF = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val li0 = Tables.lineitem(spark, sf)
    val or0 = Tables.orders(spark, sf)

    val shift = 10_000_000L
    def rep(df: DataFrame, key: String, f: Int): DataFrame =
      (0 until f).map(i => df.withColumn(key, col(key) + lit(i * shift)))
        .reduce(_ unionByName _)

    def q3(li: DataFrame, or: DataFrame, cu: DataFrame): Long =
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .join(broadcast(cu), or("o_custkey") === cu("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .groupBy("l_orderkey")
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev_c"))
        .orderBy(desc("rev_c"), col("l_orderkey"))
        .limit(10).count()

    def q18(li: DataFrame, or: DataFrame): Long = {
      val big = li.groupBy("l_orderkey")
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sq"))
        .filter(col("sq") > 250)
      or.join(big, or("o_orderkey") === big("l_orderkey"), "left_semi").count()
    }

    def q8(li: DataFrame, or: DataFrame, cu: DataFrame, su: DataFrame,
           pa: DataFrame, na: DataFrame, re: DataFrame): Long =
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .join(broadcast(cu), or("o_custkey") === cu("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(pa), li("l_partkey") === pa("p_partkey"))
        .join(broadcast(na), cu("c_nationkey") === na("n_nationkey"))
        .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
        .filter(col("r_name") === "ASIA" && col("p_type") === "ECONOMY")
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev_c"))
        .count()

    val cu = Tables.customer(spark, sf); val su = Tables.supplier(spark, sf)
    val pa = Tables.part(spark, sf); val na = Tables.nation(spark, sf)
    val re = Tables.region(spark, sf)

    val scratch = s"/tmp/graft_joinprobe_${spark.sparkContext.applicationId}"
    Seq(1, 4, maxF).distinct.foreach { f =>
      rep(li0, "l_orderkey", f).write.mode("overwrite").parquet(s"$scratch/li_$f")
      rep(or0, "o_orderkey", f).write.mode("overwrite").parquet(s"$scratch/or_$f")
      val li = spark.read.parquet(s"$scratch/li_$f")
      val or = spark.read.parquet(s"$scratch/or_$f")
      // correctness invariant: the fact-fact join must scale exactly ×f
      // (base measured from the input, so the probe works at any SF)
      val joined = li.join(or, li("l_orderkey") === or("o_orderkey")).count()
      val base = li0.count() // every lineitem row matches exactly one order
      require(joined == base * f,
        s"join cardinality $joined != ${base * f} at factor $f — re-keying broken")
      Seq(("q3", () => q3(li, or, cu)), ("q18", () => q18(li, or)),
        ("q8", () => q8(li, or, cu, su, pa, na, re))).foreach { case (n, run) =>
        run() // warm
        val t0 = System.nanoTime(); run()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"factor=$f%2d  $n%-4s ${sec}%6.2f s  (${base * f / sec / 1e6}%5.1f M fact rows/s)")
      }
    }
    // scratch replicas are probe-local; remove them on exit
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    spark.stop()
  }
}
