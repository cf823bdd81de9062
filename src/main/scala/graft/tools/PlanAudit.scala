package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Shuffle audit: count exchanges / broadcasts / sorts in every
  * declared query's physical plan, sorted by shuffle count — the
  * queries to scrutinize at 100 TB are the ones at the top. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).size
      val bcasts = "BroadcastExchange".r.findAllIn(plan).size
      val sorts = plan.linesIterator.count(_.trim.startsWith("+- Sort"))
      (name, shuffles, bcasts, sorts)
    }
    println(f"${"query"}%-26s shuffles bcasts sorts")
    rows.sortBy(-_._2).foreach { case (n, s, b, so) =>
      println(f"$n%-26s $s%8d $b%6d $so%5d")
    }
    spark.stop()
  }
}
