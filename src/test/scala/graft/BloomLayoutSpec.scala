package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures what `sink_bloom` claims (Extensions.scala): a parquet
  * bloom filter on a high-cardinality UNSORTED column lets a point
  * lookup skip row groups that min/max stats cannot (every scattered
  * file spans the full id range, so footer stats prune nothing).
  * Identical rows, identical partitioning, the only difference is the
  * bloom-filter write option — and the layouts must agree on the
  * answer.
  */
class BloomLayoutSpec extends AnyFunSuite with SparkFixture {

  private def writeLayouts(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_bloom_spec").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val ndv = ev.count()
    val bloom = s"$base/bloom"
    val plain = s"$base/plain"
    ev.repartition(16, col("user_id"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#event_id", "true")
      .option("parquet.bloom.filter.expected.ndv#event_id", ndv.toString)
      .parquet(bloom)
    ev.repartition(16, col("user_id"))
      .write.mode("overwrite").parquet(plain)
    (bloom, plain)
  }

  test("bloom filter skips row groups min/max stats cannot") {
    val (bloom, plain) = writeLayouts()
    val total = spark.read.parquet(plain).count()

    def probe(dir: String): DataFrame = spark.read.parquet(dir)
      .filter(col("event_id") === 707L).agg(sum("vc"), count(lit(1)))

    val bloomRead = ScanMetrics.scanOutputRows(probe(bloom))
    val plainRead = ScanMetrics.scanOutputRows(probe(plain))

    // Without the bloom filter the id's file is unknowable from stats:
    // every row group's [min, max] contains 707, nothing skips.
    assert(plainRead > (total * 0.9).toLong,
      s"plain layout unexpectedly skipped: $plainRead of $total")
    // With it, only the row group(s) actually holding the id — plus
    // bloom false positives — are decoded.
    assert(bloomRead <= total / 4,
      s"bloom layout read $bloomRead of $total rows — the reader is " +
        "not consulting the bloom filter (or the writer dropped it)")
    // Same answer either way.
    assert(probe(bloom).head === probe(plain).head)
  }
}
