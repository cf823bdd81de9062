package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: run the flagship Q1 aggregation on the sf0.1
  * lineitem replicated N× (union-all of re-keyed copies — derived
  * load, not new synthetic truth), to observe how the plan's wall
  * time scales with input size on fixed cores. Near-linear scaling +
  * stable shuffle volume per row is the "would survive 100×" signal;
  * superlinear blowup would flag a plan problem (e.g. skew, spill).
  *
  * Usage: sbt "runMain graft.tools.ScaleProbe [maxFactor]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxF = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.lineitem(spark, "/root/testdata/sf0.1")

    def replicated(f: Int): DataFrame =
      (0 until f).map { i =>
        // shift orderkeys so group cardinality scales with the data
        base.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 10_000_000L))
      }.reduce(_ unionByName _)

    def q1(df: DataFrame): DataFrame =
      df.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sq"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sp"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")

    Seq(1, 2, 4, maxF).distinct.foreach { f =>
      val df = replicated(f)
      q1(df).count() // warm
      val t0 = System.nanoTime()
      q1(df).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"factor=$f%2d rows=${600000L * f}%9d q1=$sec%6.2f s  (${600000L * f / sec / 1e6}%5.1f M rows/s)")
    }
    spark.stop()
  }
}
