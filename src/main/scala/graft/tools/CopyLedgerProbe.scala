package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COPY INTO ledger probe (r15): the landing-zone contract priced.
  * An orchestrator re-runs `COPY INTO` over the same prefix on every
  * tick; the verb's 100 TB claim is that a re-run costs MANIFEST
  * METADATA, not data — zero Spark jobs beyond the driver-side schema
  * peek, wall independent of how many rows the prefix holds, and a
  * delta drop costs O(new files) regardless of how many files the
  * ledger already carries.
  *
  * Shape: load a prefix of F files (default 64), then measure
  *   rerun      — the no-op re-run over all F loaded files
  *   delta      — 4 fresh files against the F-file ledger
  * at 1× and at 4× the file count (same total rows, narrower files),
  * printing Spark job count + wall for each. Done = rerun jobs stay 0
  * and delta jobs/wall stay flat as F quadruples.
  */
object CopyLedgerProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val baseFiles = if (args.nonEmpty) args(0).toInt else 64
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
    def probe[T](name: String, files: Int)(body: => T): T = {
      val before = settled()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      val n = settled() - before
      println(f"[copyledger] $name%-12s files=$files%5d jobs=$n%3d " +
        f"wall=$wall%6.2f s")
      r
    }

    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))

    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString

    Seq(baseFiles, baseFiles * 4).foreach { f =>
      val drop = tmp(s"graft_clp_drop_$f")
      val fresh = tmp(s"graft_clp_fresh_$f")
      val lake = tmp(s"graft_clp_lake_$f")
      ev.repartition(f).write.mode("overwrite").parquet(drop)
      ev.filter(col("event_type") === "error").repartition(4)
        .write.mode("overwrite").parquet(fresh)
      val (_, l0, _, _) =
        probe("initial", f) { LakeSink.copyInto(spark, drop, lake) }
      require(l0 == f, s"initial load took $l0 files, want $f")
      val (_, l1, s1, _) =
        probe("rerun", f) { LakeSink.copyInto(spark, drop, lake) }
      require(l1 == 0 && s1 == f, s"rerun loaded $l1/skipped $s1")
      val (_, l2, _, _) =
        probe("delta", f) { LakeSink.copyInto(spark, fresh, lake) }
      require(l2 == 4, s"delta loaded $l2 files, want 4")
      Seq(drop, fresh, lake).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    }
    spark.stop()
  }
}
