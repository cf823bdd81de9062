package graft

import graft.streaming.LakeSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r18 per-action PLAN-FLOOR pins. The r17 bench read put 90.9 s of
  * the 216.8 s suite in 41 lake queries whose cost is Catalyst
  * plan floors — one floor per ACTION, not per byte. Round 18 fuses
  * the floors:
  *
  *  - `appendSegment`: expectation gate + write + stats re-read +
  *    commit-gate footer count were 3 scan actions + a footer walk;
  *    now ONE observed write (CollectMetrics inside the write job);
  *  - `mergeInto`: dup-check + expectation gate + key-range bound
  *    were 3 aggregate actions over the source; now one two-level
  *    aggregate — and the insert pass (count + write + stats = 3
  *    actions, anti-joined against EVERY segment) is one observed
  *    write anti-joined against only the stats-surviving segments;
  *  - `appendPartitioned`: the expectation gate rides the staging
  *    counts aggregate (still refusing BEFORE any file is written).
  *
  * Job counts vary under AQE (a two-level aggregate is one action
  * but several jobs), so these pins count ACTIONS — QueryExecutions
  * — which is exactly the unit the plan floor is paid in. A
  * violating batch must still refuse loud, commit nothing, and (new
  * in r18, because the fused gate observes DURING the write) leave
  * no segment directory behind.
  */
class ProtocolFloorSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  /** Catalyst actions (QueryExecutions) run by `body`. Listener
    * delivery is async: poll until stable. */
  private def actionsIn(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = { n.incrementAndGet(); () }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = { n.incrementAndGet(); () }
    }
    spark.listenerManager.register(l)
    try {
      body
      var last = -1; var cur = n.get(); var polls = 0
      while ((cur != last || polls < 3) && polls < 50) {
        last = cur; Thread.sleep(100); cur = n.get(); polls += 1
      }
      cur
    } finally spark.listenerManager.unregister(l)
  }

  /** Records read from FILES by `body` (in-memory relations do not
    * count) — the scan-scope pin. */
  private def recordsReadIn(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          acc.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var last = -1L; var cur = acc.get(); var polls = 0
      while ((cur != last || polls < 3) && polls < 50) {
        last = cur; Thread.sleep(100); cur = acc.get(); polls += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** A lake with key-stats on `k` (3 segments, k in [0,9], [10,19],
    * [20,29]) so trackedCols is non-empty and merges can prune. */
  private def buildStatsLake(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_floor_spec").toString
    (0 to 2).foreach { i =>
      val df = (0 to 9).map(j => (i * 10L + j, i * 100L + j))
        .toDF("k", "v")
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/seg_b$i")
      val m = LakeSink.readManifest(dir)
      val st = m.stats + (s"seg_b$i" -> LakeSink.segmentStats(
        spark.read.parquet(s"$dir/seg_b$i"), Seq("k")))
      require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
        m.segs :+ s"seg_b$i", m.schemaV, m.schemaJson, st))
    }
    dir
  }

  test("fused appendSegment: gate + write + stats + rows in ONE action") {
    val dir = buildStatsLake()
    LakeSink.addExpectation(spark, dir, "v_pos", "v >= 0")
    val batch = Seq((40L, 1L), (41L, 2L), (42L, 3L)).toDF("k", "v")
    val acts = actionsIn {
      LakeSink.appendSegment(spark, dir, batch, "seg_fused")
    }
    assert(acts === 1,
      s"fused append ran $acts actions — the gate, the stats, and " +
        "the row count must ride the single write job")
    val m = LakeSink.readManifest(dir)
    // stats observed during the write match a from-disk recompute
    assert(m.stats("seg_fused") === LakeSink.segmentStats(
      spark.read.parquet(s"$dir/seg_fused"), Seq("k")))
    // the commit gate took the observed count — no footer walk needed
    assert(m.segRows.get("seg_fused") === Some(3L))
  }

  test("violating append refuses loud, commits nothing, leaves no dir") {
    val dir = buildStatsLake()
    LakeSink.addExpectation(spark, dir, "v_pos", "v >= 0")
    val v0 = LakeSink.readManifest(dir).version
    val e = intercept[IllegalArgumentException] {
      LakeSink.appendSegment(spark, dir,
        Seq((50L, -1L), (51L, 5L)).toDF("k", "v"), "seg_bad")
    }
    assert(e.getMessage.contains("v_pos (1 rows)"))
    assert(LakeSink.readManifest(dir).version === v0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "seg_bad")),
      "a refused append must delete the never-visible segment dir")
  }

  test("merge insert pass scans only stats-surviving segments") {
    val dir = buildStatsLake()
    // source keys 100..102 are disjoint from every segment's [lo,hi]
    // — the insert anti-join must read ZERO segment rows from disk
    val src = Seq((100L, 1L), (101L, 2L), (102L, 3L)).toDF("k", "v")
    var res: (Long, Int, Long, Long) = null
    val recs = recordsReadIn {
      res = LakeSink.mergeInto(spark, dir, src, Seq("k"))
    }
    assert(res._3 === 0L && res._4 === 3L) // 0 updated, 3 inserted
    // block-manager reads of the cached 3-row source count as input
    // records too; what must NOT appear is any multiple of a
    // segment's 10 rows — the pre-r18 insert pass anti-joined
    // against all 3 segments (30 rows)
    assert(recs < 10L,
      s"insert pass read $recs input rows — a source disjoint from " +
        "every segment's key range must anti-join against no segment")
    assert(LakeSink.readTable(spark, dir).count() === 33L)
  }

  test("fully-pruned merge is two actions: fused gate + observed insert") {
    val dir = buildStatsLake()
    val src = Seq((200L, 7L)).toDF("k", "v")
    val acts = actionsIn {
      LakeSink.mergeInto(spark, dir, src, Seq("k"))
    }
    assert(acts === 2,
      s"fully-pruned upsert ran $acts actions — expected the fused " +
        "source gate and the observed insert write only")
    assert(LakeSink.readTable(spark, dir).count() === 31L)
  }

  test("appendPartitioned: fused gate refuses BEFORE any file lands") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_floor_part").toString + "/l"
    LakeSink.createTable(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))), Some("day"))
    LakeSink.addExpectation(spark, dir, "v_pos", "v >= 0")
    val e = intercept[IllegalArgumentException] {
      LakeSink.appendPartitioned(spark, dir,
        Seq((1L, 5L), (2L, -3L)).toDF("day", "v"))
    }
    assert(e.getMessage.contains("v_pos (1 rows)"))
    val left = new java.io.File(dir).listFiles()
    assert(left.forall(_.getName == "_manifest"),
      s"refused partitioned append left files: ${left.mkString(", ")}")
    // happy path: gate+counts and the partitioned write — two actions
    val acts = actionsIn {
      LakeSink.appendPartitioned(spark, dir,
        Seq((1L, 5L), (2L, 3L)).toDF("day", "v"))
    }
    assert(acts === 2,
      s"partitioned append ran $acts actions — expected the fused " +
        "counts+gate aggregate and the one staged write")
    assert(LakeSink.readTable(spark, dir).count() === 2L)
  }
}
