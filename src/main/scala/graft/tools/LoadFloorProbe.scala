package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 measurement: what does ONE `Tables.<t>(spark, sfDir)` call
  * cost at plan-construction time (file listing + parquet footer
  * schema inference — no action), and what share of the bench's
  * per-query floor is that?
  *
  * Compares, over N iterations each:
  *   - `Tables.events` / `Tables.lineitem` construction (schema
  *     inference per call, the status quo);
  *   - `spark.read.schema(s).parquet(...)` construction with the
  *     schema supplied (what a catalog-backed table would do);
  *   - a no-IO baseline (`spark.range(1)` construction);
  *   - the bare action floor (`count()` on a 1-row in-memory plan).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.LoadFloorProbe"
  */
object LoadFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "50").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(body: => Unit): Unit = {
      body // warm once
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[loadfloor] $label%-42s ${ms}%8.2f ms/call (n=$n)")
    }

    time("range(1) construction (no IO)") { spark.range(1); () }
    time("Tables.events construction") { graft.Tables.events(spark, sfDir); () }
    time("Tables.lineitem construction") { graft.Tables.lineitem(spark, sfDir); () }
    time("Tables.orders construction") { graft.Tables.orders(spark, sfDir); () }
    val evSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val liSchema = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    time("events with explicit schema") {
      spark.read.schema(evSchema).parquet(s"$sfDir/events.parquet"); () }
    time("lineitem with explicit schema") {
      spark.read.schema(liSchema).parquet(s"$sfDir/lineitem.parquet"); () }
    val one = spark.range(1)
    time("count() action floor (1-row range)") { one.count(); () }
    time("events construction + count()") {
      graft.Tables.events(spark, sfDir).count(); () }
    time("explicit-schema events + count()") {
      spark.read.schema(evSchema).parquet(s"$sfDir/events.parquet").count(); () }
    spark.stop()
  }
}
