package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures what `sink_clustered` claims (Extensions.scala): a write
  * clustered on the filter key lets the parquet reader skip row groups
  * via footer min/max stats, so a selective scan READS a small
  * fraction of the table, while the same scan over a scattered layout
  * of identical rows reads essentially all of it.
  *
  * The measurement is the FileSourceScanExec `numOutputRows` metric —
  * rows surviving row-group-level pushdown (the vectorized reader
  * emits every row of a non-skipped group; the residual filter runs
  * above the scan). That makes it exactly the "bytes touched" proxy
  * the 100 TB argument needs: scan output ≈ rows decoded from disk.
  */
class ClusteredLayoutSpec extends AnyFunSuite with SparkFixture {

  private def writeLayouts(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_cluster_spec").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val clustered = s"$base/clustered"
    val scattered = s"$base/scattered"
    ev.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions("user_id", "event_id")
      .write.mode("overwrite").parquet(clustered)
    // same rows, hash-scattered: every file sees every user
    ev.repartition(8, col("event_id"))
      .write.mode("overwrite").parquet(scattered)
    (clustered, scattered)
  }

  test("clustered layout skips row groups a scattered layout must read") {
    val (clustered, scattered) = writeLayouts()
    val total = spark.read.parquet(scattered).count()

    def probe(dir: String): Long =
      ScanMetrics.scanOutputRows(spark.read.parquet(dir)
        .filter(col("user_id") === 7)
        .agg(count(lit(1)), sum("vc")))

    val clusteredRead = probe(clustered)
    val scatteredRead = probe(scattered)

    // The filter must reach the parquet reader for either number to
    // mean anything — with pushdown off both layouts read everything.
    assert(spark.conf.get("spark.sql.parquet.filterPushdown") == "true")
    // Scattered: user 7 lives in every file, so no row group is
    // skippable and the scan decodes (essentially) the whole table.
    assert(scatteredRead > (total * 0.9).toLong,
      s"scattered layout unexpectedly skipped: $scatteredRead of $total")
    // Clustered: one of 8 disjoint user ranges holds user 7; at least
    // 7/8 of the table is provably never decoded.
    assert(clusteredRead <= total / 4,
      s"clustered layout read $clusteredRead of $total rows — " +
        "row-group skipping is not happening; did the write lose its " +
        "range partitioning or the reader its footer-stats pushdown?")
    // And both plans agree on the answer, or the skip is a wrong-result
    // bug, not an optimization.
    val a = spark.read.parquet(clustered).filter(col("user_id") === 7)
      .agg(sum("vc")).head.getLong(0)
    val b = spark.read.parquet(scattered).filter(col("user_id") === 7)
      .agg(sum("vc")).head.getLong(0)
    assert(a == b)
  }
}
