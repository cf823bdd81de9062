package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Sanity: every declared query must run AND return rows at the given
  * scale factor (graft.Bench swallows exceptions by contract; this
  * surfaces them). Exits non-zero on any failure. */
object RowsCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, sfDir).count()
        if (n == 0) { bad += 1; println(s"EMPTY  $name") }
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"THROWS $name: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    println(s"$bad problems at $sfDir")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
