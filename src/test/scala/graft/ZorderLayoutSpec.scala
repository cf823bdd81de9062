package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures what `sink_zorder` claims (Extensions.scala): a Morton-key
  * write serves selective predicates on BOTH clustered dimensions from
  * a fraction of the table, where single-column clustering serves only
  * its own key and a scattered layout serves neither. Three layouts of
  * identical rows, two probes each, six scan-metric measurements — and
  * all layouts must agree on every answer, or the skip is a
  * wrong-result bug rather than an optimization.
  */
class ZorderLayoutSpec extends AnyFunSuite with SparkFixture {

  private val JAN4_US = 1704326400000000L // 3 of 30 days → ~10% of rows

  private def writeLayouts(): (String, String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder_spec").toString
    // tsu as epoch-µs BIGINT, matching sink_zorder: INT96 timestamp
    // columns carry no usable parquet stats, so a raw ts column would
    // measure the encoding, not the layout.
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("tsu"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val scattered = s"$base/scattered"
    val userClustered = s"$base/user_clustered"
    val zordered = s"$base/zordered"
    ev.repartition(32, col("event_id"))
      .write.mode("overwrite").parquet(scattered)
    ev.repartitionByRange(32, col("user_id"))
      .sortWithinPartitions("user_id", "event_id")
      .write.mode("overwrite").parquet(userClustered)
    val mins = expr("(tsu - 1704067200000000) div 60000000")
    val b = ev.agg(
      max(col("user_id")).cast("long"), max(mins).cast("long")).head
    ev.withColumn("zv", functions.ZOrder.zvalue(
        col("user_id"), mins, xMax = b.getLong(0), yMax = b.getLong(1)))
      .repartitionByRange(32, col("zv"))
      .sortWithinPartitions("zv", "event_id")
      .drop("zv")
      .write.mode("overwrite").parquet(zordered)
    (scattered, userClustered, zordered)
  }

  test("z-order skips on both dimensions; 1-D clustering on one; scattered on none") {
    val (scattered, userClustered, zordered) = writeLayouts()
    val total = spark.read.parquet(scattered).count()

    def byUser(dir: String): DataFrame = spark.read.parquet(dir)
      .filter(col("user_id") === 7).agg(sum("vc"), count(lit(1)))
    def byTime(dir: String): DataFrame = spark.read.parquet(dir)
      .filter(col("tsu") < JAN4_US)
      .agg(sum("vc"), count(lit(1)))

    val su = ScanMetrics.scanOutputRows(byUser(scattered))
    val st = ScanMetrics.scanOutputRows(byTime(scattered))
    val uu = ScanMetrics.scanOutputRows(byUser(userClustered))
    val ut = ScanMetrics.scanOutputRows(byTime(userClustered))
    val zu = ScanMetrics.scanOutputRows(byUser(zordered))
    val zt = ScanMetrics.scanOutputRows(byTime(zordered))

    // Scattered: every file spans both full domains — nothing skips.
    assert(su > (total * 0.85).toLong, s"scattered/user read $su of $total")
    assert(st > (total * 0.85).toLong, s"scattered/time read $st of $total")
    // User-clustered: its own key skips hard; time not at all. This
    // asymmetry is the motivation for z-order, so pin BOTH sides.
    assert(uu <= total / 4, s"user-clustered/user read $uu of $total")
    assert(ut > (total * 0.85).toLong, s"user-clustered/time read $ut of $total")
    // Z-ordered: both predicates skip most of the table — neither as
    // hard as a dedicated 1-D sort serves its own key (z-tiles trade
    // per-dimension tightness for covering both), but both far below
    // a full scan.
    assert(zu <= total / 2, s"zordered/user read $zu of $total — no skip")
    assert(zt <= total / 2, s"zordered/time read $zt of $total — no skip")

    // All layouts agree on every answer.
    def ans(df: DataFrame): (Long, Long) = {
      val r = df.head; (r.getLong(0), r.getLong(1))
    }
    assert(ans(byUser(scattered)) === ans(byUser(userClustered)))
    assert(ans(byUser(scattered)) === ans(byUser(zordered)))
    assert(ans(byTime(scattered)) === ans(byTime(userClustered)))
    assert(ans(byTime(scattered)) === ans(byTime(zordered)))
  }

  test("zvalue is a correct Morton interleave on already-narrow domains") {
    // bits=2, domains already ≤ 3 → no scaling: z(x,y) enumerates the
    // textbook 4×4 Morton curve.
    val df = spark.range(16).toDF("i")
      .withColumn("x", col("i") % 4)
      .withColumn("y", expr("i div 4"))
      .withColumn("z", functions.ZOrder.zvalue(
        col("x"), col("y"), xMax = 3L, yMax = 3L, bits = 2))
    val got = df.select("x", "y", "z").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 1L, (0L, 1L) -> 2L, (1L, 1L) -> 3L,
      (2L, 0L) -> 4L, (3L, 0L) -> 5L, (2L, 1L) -> 6L, (3L, 1L) -> 7L,
      (0L, 2L) -> 8L, (1L, 2L) -> 9L, (0L, 3L) -> 10L, (1L, 3L) -> 11L,
      (2L, 2L) -> 12L, (3L, 2L) -> 13L, (2L, 3L) -> 14L, (3L, 3L) -> 15L)
    assert(got === expected)
  }
}
