package graft

import graft.streaming.{LakeSink, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming upsert ingestion ([[StreamOps.startUpsertSink]], r15):
  * the CDC-apply sink, under both write strategies and under kills.
  *
  *  - `dvMaxFraction = 1.0` (merge-on-read) must produce EXACTLY the
  *    same table rows as `0.0` (copy-on-write) on the same feed while
  *    writing zero rewrites — only deletion vectors plus appends; the
  *    CoW twin must write zero DVs and rewrite every touched segment.
  *    (The A/B is also the no-dead-parameters proof: remove the
  *    parameter's effect and one side's census assertion fails.)
  *  - A kill AFTER the lake commit, BEFORE the streaming checkpoint
  *    commit (the worst window) must replay exactly-once: the txn
  *    guard rides the manifest CAS, so the replayed batch is a
  *    structural no-op — row contents AND the DV census stay exact
  *    (a double-applied batch would double the retired positions).
  */
class UpsertStreamSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Target: 30 rows in 3 ten-row segments. Every update batch below
    * touches all three — and matches a strict subset of each, so the
    * MoR strictly-partial rule applies everywhere. */
  private def mkTarget(dir: String): Unit = {
    import spark.implicits._
    val df = (0L until 30L).map(i => (i, s"row$i", i * 10L))
      .toDF("id", "name", "v")
    LakeSink.createTable(dir, df.schema)
    (0 until 3).foreach { g =>
      LakeSink.appendSegment(spark, dir,
        df.filter(col("id") >= g * 10L && col("id") < (g + 1) * 10L),
        f"seg_$g%02d")
    }
  }

  // batch 2 updates only ORIGINAL rows (updating batch 1's inserted
  // row 100 would fully match its one-row segment and legitimately
  // fall back to a rewrite — a different case than the one pinned here)
  private val batch1 = Seq((1L, "u1", 111L), (11L, "u11", 222L),
    (21L, "u21", 333L), (100L, "new100", 1000L))
  private val batch2 = Seq((2L, "u2", 444L), (12L, "u12", 555L),
    (22L, "u22", 666L), (101L, "new101", 1001L))

  private def expected: Seq[(Long, String, Long)] = {
    val upd = (batch1 ++ batch2).map(r => r._1 -> r).toMap
    ((0L until 30L).map(i => upd.getOrElse(i, (i, s"row$i", i * 10L))) ++
      Seq(upd(100L), upd(101L))).sortBy(_._1)
  }

  private def contents(dir: String): Seq[(Long, String, Long)] =
    LakeSink.readTable(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("MoR upsert sink: zero rewrites + DV census; CoW twin: same rows, zero DVs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def run(dv: Double): (String, Long, Long) = {
      val dir = tmp("graft_ups_t")
      val ck = tmp("graft_ups_ck")
      mkTarget(dir)
      val rw = new java.util.concurrent.atomic.AtomicLong
      val nUpd = new java.util.concurrent.atomic.AtomicLong
      val in = MemoryStream[(Long, String, Long)]
      val q = StreamOps.startUpsertSink(
        in.toDF().toDF("id", "name", "v"), dir, Seq("id"), ck,
        appId = "spec-upsert", dvMaxFraction = dv,
        onBatch = (_, r, u, _) => {
          rw.addAndGet(r.toLong); nUpd.addAndGet(u); ()
        })
      try {
        in.addData(batch1); q.processAllAvailable()
        in.addData(batch2); q.processAllAvailable()
      } finally q.stop()
      (dir, rw.get, nUpd.get)
    }

    val (morDir, morRw, morUpd) = run(1.0)
    val (cowDir, cowRw, cowUpd) = run(0.0)

    assert(contents(morDir) === expected)
    assert(contents(cowDir) === expected)
    assert(morUpd === 6L && cowUpd === 6L)

    // MoR: no rewrites, 6 retired positions across the 3 original segments
    assert(morRw === 0L, "merge-on-read upsert rewrote a segment")
    val morM = LakeSink.readManifest(morDir)
    assert(morM.dv.keySet === Set("seg_00", "seg_01", "seg_02"))
    assert(morM.dv.values.map(_.rows).sum === 6L)

    // CoW: every touched segment rewritten per batch, no DVs anywhere
    assert(cowRw === 6L, s"copy-on-write rewrote $cowRw segments, want 3+3")
    assert(LakeSink.readManifest(cowDir).dv.isEmpty)
  }

  test("kill after lake commit, before checkpoint commit: replay is exactly-once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = tmp("graft_ups_kill_t")
    val ck = tmp("graft_ups_kill_ck")
    mkTarget(dir)

    final class Kill extends RuntimeException("injected kill")
    @volatile var killOnce = true
    val in = MemoryStream[(Long, String, Long)]
    val feed = in.toDF().toDF("id", "name", "v")

    val q1 = StreamOps.startUpsertSink(feed, dir, Seq("id"), ck,
      appId = "spec-upsert-kill", dvMaxFraction = 1.0,
      afterCommit = { id =>
        if (killOnce && LakeSink.readManifest(dir)
            .txns.get("spec-upsert-kill").contains(id)) {
          killOnce = false
          throw new Kill
        }
      })
    in.addData(batch1)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination(120000)
    }
    assert(!killOnce, "kill seam never fired — test shape broke")
    val afterKill = contents(dir)
    assert(afterKill.size === 31, "kill fired before the batch-1 commit")

    // restart from the same checkpoint: batch 1 REPLAYS; the txn guard
    // must no-op it (same batchId), then batch 2 applies normally
    val q2 = StreamOps.startUpsertSink(feed, dir, Seq("id"), ck,
      appId = "spec-upsert-kill", dvMaxFraction = 1.0)
    try {
      q2.processAllAvailable()
      assert(contents(dir) === afterKill, "replayed batch re-applied")
      in.addData(batch2)
      q2.processAllAvailable()
    } finally q2.stop()

    assert(contents(dir) === expected)
    // a double-applied replay would have retired 3 extra positions
    assert(LakeSink.readManifest(dir).dv.values.map(_.rows).sum === 6L)
  }
}
