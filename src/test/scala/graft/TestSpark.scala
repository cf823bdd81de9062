package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (scalatest runs suites
  * in one forked JVM; a fresh session per suite would pay ~4 s each). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkFixture {
  lazy val spark: SparkSession = TestSpark.spark
  /** Smallest driver-generated dataset; read-only. */
  val sfDir = "/root/testdata/sf0.001"
}
