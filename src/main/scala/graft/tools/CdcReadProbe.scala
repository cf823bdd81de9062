package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC read-cost probe (r11): the change-data feed's design claim is
  * that a consumer pays O(changed rows), while the fallback a
  * cdc-less lake forces — diffing two table snapshots — pays
  * O(table) twice plus a shuffle. This probe measures both on the
  * SAME change: an N×-replicated events lake in 32 segments, one
  * point DELETE touching a handful of rows, then
  *
  *   feed  = changesCdcBetween(v, v+1).count()   — reads ONE tiny
  *           change segment, plans from manifest metadata;
  *   diff  = readTableAsOf(v) EXCEPT readTableAsOf(v+1), counted —
  *           two full scans + a hash shuffle over every column.
  *
  * The gap WIDENS linearly with table size while the feed cost is
  * flat — which is the 100 TB argument in one number: at warehouse
  * scale the diff is simply not runnable per-trigger, the feed is.
  */
object CdcReadProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val span = base.agg(max("event_id")).head().getLong(0) + 1L
    val ev = (0 until replicas).map(r => base
        .withColumn("event_id", col("event_id") + lit(r * span)))
      .reduce(_ unionByName _)
      .persist()
    val nRows = ev.count()

    val dir = java.nio.file.Files
      .createTempDirectory("graft_cdc_read").toString
    (0 until 32).foreach { i =>
      val seg = s"seg_b$i"
      ev.filter(col("event_id") % 32 === i)
        .write.mode("overwrite").parquet(s"$dir/$seg")
      val m = LakeSink.readManifest(dir)
      require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
        m.segs :+ seg), s"probe ingest commit $i lost a race")
    }
    ev.unpersist()

    val v0 = LakeSink.readManifest(dir).version
    val (v1, _, _, nDel) = LakeSink.deleteWhere(spark, dir,
      col("event_id") % (nRows / 4) === 17L, cdc = true)

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once (JIT/codegen), then measure min-of-3
    def feedCount(): Long =
      LakeSink.changesCdcBetween(spark, dir, v0, v1).count()
    def diffCount(): Long =
      LakeSink.readTableAsOf(spark, dir, v0)
        .except(LakeSink.readTableAsOf(spark, dir, v1)).count()
    feedCount(); diffCount()
    val (nFeed, tFeed) = (1 to 3).map(_ => time(feedCount())).minBy(_._2)
    val (nDiff, tDiff) = (1 to 3).map(_ => time(diffCount())).minBy(_._2)
    require(nFeed == nDel && nDiff == nDel,
      s"probe invariant: feed=$nFeed diff=$nDiff deleted=$nDel must agree")

    println(f"""{"probe":"cdc_read","sf":"$sfDir","replicas":$replicas,""" +
      f""""n_rows":$nRows,"n_changed":$nDel,""" +
      f""""feed_sec":$tFeed%.3f,"snapshot_diff_sec":$tDiff%.3f,""" +
      f""""ratio":${tDiff / tFeed}%.1f}""")
  }
}
