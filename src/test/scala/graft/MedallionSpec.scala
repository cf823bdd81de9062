package graft

import java.sql.Timestamp

import graft.streaming.{LakeSink, Medallion}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end medallion chain (bronze → silver → gold), the VERDICT
  * r10 #8 contract: two chained change-feed consumers, each folding
  * into its own lake table, EXACTLY-ONCE under kills injected in the
  * worst window at both hops — after the lake commit, before the
  * streaming checkpoint commit. The final silver and gold contents
  * must equal batch oracles computed from bronze alone; any dup
  * (replayed fold applied twice) or loss (batch skipped) diverges.
  */
class MedallionSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Synthetic bronze events: hour `h`, minute offsets, one value per
    * (hour, type); deterministic so the oracle is exact. */
  private def mkEvents(hours: Range, perHour: Int): Seq[
      (Long, Timestamp, Long, String, Double)] = {
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC
    for {
      h <- hours
      k <- 0 until perHour
    } yield {
      val id = h * 100L + k
      val ts = new Timestamp(base + h * 3600000L + k * 60000L)
      val typ = if (k % 3 == 0) "click" else if (k % 3 == 1) "view" else "purchase"
      (id, ts, id % 7, typ, (id % 50) + 0.25)
    }
  }

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  /** A sentinel one hour + watermark past the last real hour: advances
    * the watermark so every real window closes, while its own window
    * never does (no later event), so it appears in neither silver nor
    * gold. Placed LAST — a far-future sentinel would make every
    * subsequent real event late and watermark-dropped. */
  private def sentinel(hour: Int): Seq[(Long, Timestamp, Long, String, Double)] =
    Seq((900000L + hour, new Timestamp(1704067200000L + hour * 3600000L),
      0L, "sentinel", 0.0))

  test("bronze→silver→gold: exactly-once across mid-commit kills at both hops") {
    val bronze = tmp("graft_med_bronze")
    val silver = tmp("graft_med_silver")
    val gold = tmp("graft_med_gold")
    val ckS = tmp("graft_med_ck_s")
    val ckG = tmp("graft_med_ck_g")

    // bronze: created + first appends before any consumer exists
    LakeSink.createTable(bronze, toDf(Nil).schema)
    Medallion.initTables(silver, gold)

    var nextSeg = 0
    def appendBronze(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit = {
      LakeSink.appendSegment(spark, bronze, toDf(rows), f"seg_e$nextSeg%03d")
      nextSeg += 1
    }

    appendBronze(mkEvents(0 to 1, 6))

    // ---- hop 1, kill armed from the start: the FIRST batch that
    // commits closed windows to silver dies AFTER the lake commit,
    // BEFORE the streaming checkpoint commit — the worst window.
    // (Emission timing is the engine's: a watermark advance schedules
    // a no-data batch, so the commit can land inside any
    // processAllAvailable — the intercept wraps the whole step.)
    final class Kill extends RuntimeException("injected kill")
    @volatile var killSilverOnce = true
    val s1 = Medallion.startSilver(spark, bronze, silver, ckS,
      afterCommit = { id =>
        if (killSilverOnce && LakeSink.readManifest(silver)
            .txns.get("medallion-silver").contains(id)) {
          killSilverOnce = false
          throw new Kill
        }
      })
    s1.processAllAvailable() // hours 0-1: nothing closed yet, no commit
    assert(killSilverOnce, "silver committed before any window closed")

    // hours 2-3 move the watermark to 2:55 → windows 0-1 close → the
    // emitting batch commits → kill
    appendBronze(mkEvents(2 to 3, 6))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      s1.processAllAvailable()
      s1.awaitTermination(120000)
    }
    assert(!killSilverOnce, "kill seam never fired — test shape broke")
    val silverAfterKill = LakeSink.readTable(spark, silver).count()
    assert(silverAfterKill > 0, "kill fired before any silver commit")

    // restart: the killed batch REPLAYS; its appendSegment must no-op
    // via the txn guard (same batchId), not duplicate the segment
    val s2 = Medallion.startSilver(spark, bronze, silver, ckS)
    s2.processAllAvailable()
    assert(LakeSink.readTable(spark, silver).count() === silverAfterKill,
      "replayed silver batch duplicated rows")

    // hours 4-5 close windows 2-3 through the restarted query
    appendBronze(mkEvents(4 to 5, 6))
    s2.processAllAvailable()

    // ---- hop 2, kill armed from the start: gold's first fold (the
    // silver snapshot batch, non-empty by now) commits, then dies
    @volatile var killGoldOnce = true
    val g1 = Medallion.startGold(spark, silver, gold, ckG,
      afterCommit = { id =>
        if (killGoldOnce && LakeSink.readManifest(gold)
            .txns.get("medallion-gold").contains(id)) {
          killGoldOnce = false
          throw new Kill
        }
      })
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      g1.processAllAvailable()
      g1.awaitTermination(120000)
    }
    assert(!killGoldOnce, "gold kill seam never fired")
    val goldAfterKill = LakeSink.readTable(spark, gold)
      .agg(sum("n")).head().getLong(0)

    val g2 = Medallion.startGold(spark, silver, gold, ckG)
    g2.processAllAvailable()
    assert(LakeSink.readTable(spark, gold).agg(sum("n")).head().getLong(0)
      === goldAfterKill, "replayed gold fold double-counted")

    // ---- the sentinel closes hours 4-5; the chain drains ------------
    appendBronze(sentinel(7)) // watermark → 6:50 ≥ every real window end
    s2.processAllAvailable()
    g2.processAllAvailable()
    s2.stop(); g2.stop()

    // ---- oracles: recompute both tables from bronze alone ----------
    val real = LakeSink.readTable(spark, bronze)
      .filter(col("event_type") =!= "sentinel")
    val wantSilver = real
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select(unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("cents"))
      .orderBy("win_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val gotSilver = LakeSink.readTable(spark, silver)
      .orderBy("win_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(gotSilver === wantSilver,
      "silver diverged from the batch oracle (dup or loss survived the kills)")

    val wantGold = real.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy("event_type")
      .collect().map(_.toSeq).toSeq
    val gotGold = LakeSink.readTable(spark, gold)
      .orderBy("event_type")
      .collect().map(_.toSeq).toSeq
    assert(gotGold === wantGold,
      "gold diverged from the batch oracle (dup or loss survived the kills)")
  }

  test("GDPR: bronze DELETEs propagate incrementally through the CDC " +
      "chain and erase derived rows end-to-end") {
    val bronze = tmp("graft_gdpr_bronze")
    val silver = tmp("graft_gdpr_silver")
    val gold = tmp("graft_gdpr_gold")
    LakeSink.createTable(bronze, toDf(Nil).schema)
    Medallion.initTables(silver, gold)
    val sq = Medallion.startSilverCdc(spark, bronze, silver,
      tmp("graft_gdpr_ck_s"))
    val gq = Medallion.startGoldCdc(spark, silver, gold,
      tmp("graft_gdpr_ck_g"))
    def drain(): Unit = { sq.processAllAvailable(); gq.processAllAvailable() }

    def silverRows(): Seq[Seq[Any]] = LakeSink.readTable(spark, silver)
      .orderBy("win_start", "event_type").collect().map(_.toSeq).toSeq
    def goldRows(): Seq[Seq[Any]] = LakeSink.readTable(spark, gold)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    def wantSilver(): Seq[Seq[Any]] = LakeSink.readTable(spark, bronze)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select(unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("cents"))
      .orderBy("win_start", "event_type").collect().map(_.toSeq).toSeq
    def wantGold(): Seq[Seq[Any]] = LakeSink.readTable(spark, bronze)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq

    try {
      LakeSink.appendSegment(spark, bronze,
        toDf(mkEvents(0 to 2, 6)), "seg_e000")
      drain()
      // no watermark in the CDC variant: every window is already live
      assert(silverRows() === wantSilver(), "CDC silver rollup wrong")
      assert(goldRows() === wantGold(), "CDC gold totals wrong")

      // GDPR erasure: one user's rows leave bronze; the derived tables
      // must correct themselves from the change rows alone
      val (_, _, _, nDel) = LakeSink.deleteWhere(spark, bronze,
        col("user_id") === 3L, cdc = true)
      assert(nDel > 0L, "test shape: user 3 had no rows")
      drain()
      assert(silverRows() === wantSilver(),
        "silver still counts erased rows after GDPR delete")
      assert(goldRows() === wantGold(),
        "gold still counts erased rows after GDPR delete")

      // erase an entire type: its windows hit zero and must be GONE
      LakeSink.deleteWhere(spark, bronze,
        col("event_type") === "click", cdc = true)
      drain()
      assert(!silverRows().exists(_.contains("click")),
        "zero-count click windows linger in silver")
      assert(!goldRows().exists(_.contains("click")),
        "zero-count click totals linger in gold")
      assert(silverRows() === wantSilver() && goldRows() === wantGold())

      // crash-replay the LAST silver fold directly: the txn guard must
      // no-op the merge and the zero-row cleanup must stay idempotent
      val tip = LakeSink.readManifest(bronze).version
      val lastBatch = LakeSink.readManifest(silver)
        .txns("medallion-silver-cdc")
      val before = silverRows()
      Medallion.foldSilverCdc(
        LakeSink.changesCdcBetween(spark, bronze, tip - 1, tip),
        lastBatch, silver)
      assert(silverRows() === before, "replayed CDC fold changed silver")
    } finally { sq.stop(); gq.stop() }
  }

  test("GDPR via deletion vectors: a merge-on-read bronze erasure " +
      "feeds the CDC chain identically (no rewrite), and a later " +
      "REORG purge is invisible to the feed") {
    val bronze = tmp("graft_gdprdv_bronze")
    val silver = tmp("graft_gdprdv_silver")
    val gold = tmp("graft_gdprdv_gold")
    LakeSink.createTable(bronze, toDf(Nil).schema)
    Medallion.initTables(silver, gold)
    val sq = Medallion.startSilverCdc(spark, bronze, silver,
      tmp("graft_gdprdv_ck_s"))
    val gq = Medallion.startGoldCdc(spark, silver, gold,
      tmp("graft_gdprdv_ck_g"))
    def drain(): Unit = { sq.processAllAvailable(); gq.processAllAvailable() }
    def goldRows(): Seq[Seq[Any]] = LakeSink.readTable(spark, gold)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    def wantGold(): Seq[Seq[Any]] = LakeSink.readTable(spark, bronze)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    try {
      LakeSink.appendSegment(spark, bronze,
        toDf(mkEvents(0 to 2, 6)), "seg_e000")
      drain()
      assert(goldRows() === wantGold())
      // merge-on-read erasure: bronze keeps its files, the DV hides
      // the rows, and the cdc images drive the same downstream fix-up
      val preSegs = LakeSink.readManifest(bronze).segs
      val (_, rw, _, nDel) = LakeSink.deleteWhere(spark, bronze,
        col("user_id") === 3L, cdc = true, dvMaxFraction = 1.0)
      assert(nDel > 0L && rw === 0, "erasure must be DV-backed")
      val mDel = LakeSink.readManifest(bronze)
      assert(mDel.segs === preSegs && mDel.dv.nonEmpty,
        "bronze files untouched, DV recorded")
      drain()
      assert(goldRows() === wantGold(),
        "gold still counts erased rows after DV-backed GDPR delete")
      // REORG purge pays the debt; the layout-only commit must flow
      // through the change feed as a no-op, not a poison pill
      val (_, nPurged) = LakeSink.purgeDv(spark, bronze)
      assert(nPurged === 1)
      drain()
      assert(goldRows() === wantGold(), "purge commit disturbed the feed")
    } finally { sq.stop(); gq.stop() }
  }

  test("medallion: subscribe-first — consumers attach before bronze has data") {
    val bronze = tmp("graft_med2_bronze")
    val silver = tmp("graft_med2_silver")
    val gold = tmp("graft_med2_gold")
    LakeSink.createTable(bronze, toDf(Nil).schema)
    Medallion.initTables(silver, gold)
    val s = Medallion.startSilver(spark, bronze, silver,
      tmp("graft_med2_ck_s"))
    val g = Medallion.startGold(spark, silver, gold, tmp("graft_med2_ck_g"))
    try {
      s.processAllAvailable(); g.processAllAvailable() // both idle, no data
      LakeSink.appendSegment(spark, bronze,
        toDf(mkEvents(0 to 0, 3)), "seg_e000")
      s.processAllAvailable()
      LakeSink.appendSegment(spark, bronze, toDf(sentinel(2)), "seg_e001")
      s.processAllAvailable() // watermark 1:50 closes hour 0 → silver
      g.processAllAvailable()
      val got = LakeSink.readTable(spark, gold).orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === Seq(("click", 1L), ("purchase", 1L), ("view", 1L)))
    } finally { s.stop(); g.stop() }
  }
}
