package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DML JOB-COUNT probe (r15): the scale ceiling named by the r14
  * verdict is not per-segment COST but per-segment JOB SUBMISSION —
  * every lake DML verb planned and wrote one segment at a time, so a
  * broad-predicate UPDATE touching S segments paid O(S) sequential
  * Spark jobs: a driver-side throughput ceiling no per-segment
  * improvement fixes (at 100 TB, S is thousands, and each job's
  * submit/schedule round-trip is pure serial latency while the
  * cluster idles). This probe builds an N-segment lake (default 64)
  * with NO stats/partition metadata (so nothing prunes — every verb
  * must touch every segment) and counts actual Spark job submissions
  * via a SparkListener for each DML verb with a predicate that
  * matches SOME but not ALL rows of every segment (the rewrite path —
  * the expensive class):
  *
  *   UPDATE  broad predicate, copy-on-write       (all N rewritten)
  *   DELETE  broad predicate, copy-on-write       (all N rewritten)
  *   MERGE   broad source,    copy-on-write       (all N rewritten)
  *   DELETE  broad predicate, merge-on-read DVs   (all N DV'd)
  *   REORG PURGE of the N deletion vectors        (all N rewritten)
  *
  * Before r15's batched planner, each verb ran ~2-4 jobs PER SEGMENT
  * (cache-materializing count, rewrite write, stats read-back);
  * after, the whole touched set plans in ONE grouped-by-segment
  * aggregate over a single multi-segment positional read and writes
  * through ONE staged partitioned write — job count ~O(1) in N.
  * Run with two segment counts (e.g. 16 and 64) to see the slope:
  * O(S) before (jobs ∝ segments), flat after.
  */
object DmlJobProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nSegs = if (args.nonEmpty) args(0).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    // listener delivery is async: settle until the counter is stable
    def settled(): Int = {
      var last = -1
      var cur = jobs.get()
      while (cur != last) {
        last = cur
        Thread.sleep(300)
        cur = jobs.get()
      }
      cur
    }
    def probe[T](name: String)(body: => T): Unit = {
      val before = settled()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      val n = settled() - before
      println(f"[dmljobs] $name%-18s jobs=$n%4d wall=$wall%7.2f s" +
        f" (segments=$nSegs)")
    }

    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))

    def mkLake(): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dmljob").toString
      // one staged write splits the N segments (the llm_dedup_dv
      // ingest trick) — probe setup must not itself be O(N) jobs
      val stage = s"$dir/_stage"
      ev.withColumn("__b", pmod(col("event_id"), lit(nSegs)))
        .write.partitionBy("__b").parquet(stage)
      val segs = new java.io.File(stage).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("__b="))
        .sortBy(_.getName.stripPrefix("__b=").toInt)
        .map { f =>
          val seg = "seg_b%04d".format(f.getName.stripPrefix("__b=").toInt)
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(dir, seg))
          seg
        }.toSeq
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
      require(LakeSink.commitManifest(dir, 1L, 0L, segs),
        "probe ingest commit lost a race")
      dir
    }

    // ~1/16 of every segment matches (mod on the quotient spreads the
    // matches across the event_id % nSegs segment keying) — partial
    // match in every segment, nothing prunable, nothing fully covered
    val part = (col("event_id") / nSegs).cast("long") % 16 === 0

    val dirU = mkLake()
    probe("update_cow") {
      LakeSink.updateWhere(spark, dirU, part,
        Map("vc" -> (col("vc") + lit(1L))))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirU))

    val dirD = mkLake()
    probe("delete_cow") {
      LakeSink.deleteWhere(spark, dirD, part)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirD))

    val dirM = mkLake()
    val src = ev.filter(part).select(col("event_id"),
      (col("vc") + lit(7L)).as("vc"))
    probe("merge_cow") {
      LakeSink.mergeClauses(spark, dirM, src, Seq("event_id"),
        matched = Seq(LakeSink.MergeClause.Update(None,
          Some(Seq("vc" -> "s.vc")))))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirM))

    val dirV = mkLake()
    probe("delete_dv") {
      LakeSink.deleteWhere(spark, dirV, part, dvMaxFraction = 1.0)
    }
    probe("reorg_purge") {
      LakeSink.purgeDv(spark, dirV)
    }
    // manifest TIP-READ latency at this width (r16): after the DML
    // churn above the log is a real mixed chain (snapshot + deltas);
    // the walk-back must stay interactive at production lake widths —
    // this is the read every verb's planning starts from
    val tr0 = System.nanoTime()
    val reads = 20
    (0 until reads).foreach(_ => LakeSink.readManifest(dirV))
    println(f"[dmljobs] tip_read            " +
      f"ms=${(System.nanoTime() - tr0) / 1e6 / reads}%7.1f per read" +
      f" (segments=$nSegs)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirV))

    spark.stop()
  }
}
