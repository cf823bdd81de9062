package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stats-at-commit A/B (VERDICT r10 #7): segment stats buy manifest-
  * level file skipping, but every write that materializes a segment
  * pays one extra aggregate job to collect them. This probe turns the
  * r10 "sink_lake_update regressed 1.5 → 2.2 s, probably the stats"
  * guess into a measured number: two lakes with IDENTICAL data — one
  * tracking (tse, event_type) stats at every commit, one tracking
  * nothing — each put through the same write battery, plus the
  * read-side payoff the cost buys.
  *
  * Battery per lake (k repetitions, min wall per op — min isolates
  * the operation from host-contention noise):
  *   append  — appendSegment of a fresh segment
  *   update  — updateWhere repricing one event_type (copy-on-write)
  *   delete  — deleteWhere dropping one event_type
  * Read-side payoff, stats lake only: readTableWhere on a tse
  * quartile and readTableWhereEq on a string point — scanned-segment
  * counts vs the no-stats lake (which must scan everything).
  *
  * What the numbers mean at 100 TB: the stats cost scales with the
  * data a writer just wrote (one extra pass over the new segment —
  * and in a production writer it is FREE, folded into the parquet
  * footer accumulation this probe's explicit job stands in for),
  * while the skipping payoff scales with the data every future reader
  * does NOT open. The A/B quantifies the worst case: stats paid as a
  * separate job, on a write-bound op, at a scale where the read
  * payoff is smallest.
  */
object StatsCommitProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), unix_micros(col("ts")).as("tse"),
      col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    ev.persist().count()

    val statsCols = Seq("tse", "event_type")
    val root = java.nio.file.Files.createTempDirectory("graft_stats_ab")

    /** 8 event-id buckets → 8 segments, committed with or without
      * per-segment stats — the same shape as the bench lake fixtures. */
    def buildLake(name: String, withStats: Boolean): String = {
      val dir = root.resolve(name).toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      (0 until 8).foreach { i =>
        val seg = s"seg_b$i"
        ev.filter(col("event_id") % 8 === i)
          .write.mode("overwrite").parquet(s"$dir/$seg")
        val m = LakeSink.readManifest(dir)
        val st =
          if (withStats) Map(seg -> LakeSink.segmentStats(
            spark.read.parquet(s"$dir/$seg"), statsCols))
          else Map.empty[String, Map[String, LakeSink.ColStat]]
        require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
          m.segs :+ seg, stats = m.stats ++ st),
          s"probe ingest commit $i lost a race")
      }
      dir
    }

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    /** min-of-k wall for one op, rebuilding the lake before each rep
      * so every rep sees the identical pre-op state. */
    def bench(name: String, withStats: Boolean)(op: String => Unit): Double =
      (1 to reps).map { r =>
        val dir = buildLake(s"${name}_r$r", withStats)
        time(op(dir))
      }.min

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    Seq(false, true).foreach { withStats =>
      val tag = if (withStats) "stats" else "nostats"
      results(s"append_$tag") = bench(s"ap_$tag", withStats) { dir =>
        LakeSink.appendSegment(spark, dir,
          ev.filter(col("event_id") % 8 === 3)
            .withColumn("event_id", col("event_id") + 100000000L),
          "seg_new")
      }
      results(s"update_$tag") = bench(s"up_$tag", withStats) { dir =>
        LakeSink.updateWhere(spark, dir, col("event_type") === "error",
          Map("vc" -> (col("vc") + 100L)))
      }
      results(s"delete_$tag") = bench(s"de_$tag", withStats) { dir =>
        LakeSink.deleteWhere(spark, dir, col("event_type") === "click")
      }
    }

    // ---- CDC write-cost A/B (same method, orthogonal knob): what
    // recording change rows costs each DML — one extra write of the
    // changed rows (pre+post for update). Run on the no-stats lake so
    // the two knobs don't confound.
    results("update_cdc") = bench("up_cdc", withStats = false) { dir =>
      LakeSink.updateWhere(spark, dir, col("event_type") === "error",
        Map("vc" -> (col("vc") + 100L)), cdc = true)
    }
    results("delete_cdc") = bench("de_cdc", withStats = false) { dir =>
      LakeSink.deleteWhere(spark, dir, col("event_type") === "click",
        cdc = true)
    }

    // ---- read-side payoff: scanned-segment counts ------------------
    // The write A/B above uses the id-bucketed layout (matching the
    // bench DML fixtures) where every segment spans the full tse
    // range — stats there prune nothing, which is exactly why the
    // payoff must be measured on the layout a 100 TB lake actually
    // has: TIME-ORDERED ingest, each segment one time slice. A
    // quartile-range probe then opens ~2 of 8 segments with stats
    // and all 8 without.
    def buildTimeLake(name: String, withStats: Boolean): String = {
      val dir = root.resolve(name).toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val bnd = ev.agg(min("tse"), max("tse")).head()
      val (lo, hi) = (bnd.getLong(0), bnd.getLong(1))
      val span = hi - lo + 1
      (0 until 8).foreach { i =>
        val seg = s"seg_t$i"
        ev.filter(expr(s"((tse - $lo) * 8) div $span") === i)
          .write.mode("overwrite").parquet(s"$dir/$seg")
        val m = LakeSink.readManifest(dir)
        val st =
          if (withStats) Map(seg -> LakeSink.segmentStats(
            spark.read.parquet(s"$dir/$seg"), statsCols))
          else Map.empty[String, Map[String, LakeSink.ColStat]]
        require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
          m.segs :+ seg, stats = m.stats ++ st),
          s"time ingest commit $i lost a race")
      }
      dir
    }
    val statsDir = buildTimeLake("read_stats", withStats = true)
    val noDir = buildTimeLake("read_nostats", withStats = false)
    val b = ev.agg(min("tse"), max("tse")).head()
    val (t0, t1) = (b.getLong(0), b.getLong(1))
    val qLo = t0 + (t1 - t0) / 4
    val qHi = t0 + (t1 - t0) / 2
    val (selS, scannedS, totalS) =
      LakeSink.readTableWhere(spark, statsDir, "tse", qLo, qHi)
    val (selN, scannedN, totalN) =
      LakeSink.readTableWhere(spark, noDir, "tse", qLo, qHi)
    require(selS.count() == selN.count(),
      "stats pruning changed the answer — skipping bug")

    def j(d: Double): String = f"$d%.3f"
    val ab = results.map { case (k, v) => s""""$k":${j(v)}""" }.mkString(",")
    val json =
      s"""{"probe":"stats_commit_ab","sf":"$sfDir","reps":$reps,$ab,""" +
        s""""read_tse_scanned_stats":${scannedS.size},""" +
        s""""read_tse_scanned_nostats":${scannedN.size},""" +
        s""""n_segments":$totalS}"""
    require(totalS == totalN)
    println(json)
  }
}
