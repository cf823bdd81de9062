package graft

import graft.streaming.LakeSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DELETION VECTORS (r12): merge-on-read point DML — the answer to
  * copy-on-write's write amplification for GDPR-style deletes. A
  * point delete with `dvMaxFraction > 0` writes O(deleted rows) (a
  * per-segment positional DV file referenced from the manifest)
  * instead of rewriting every touched segment. What must hold:
  *
  *  - the delete's RESULT is indistinguishable from copy-on-write:
  *    every reader (table, time travel, stats-pruned, DML planning
  *    reads) reconciles DVs at scan;
  *  - DV files are immutable — a second delete supersedes with the
  *    union; fully-matching segments still drop by metadata;
  *  - the fraction guard falls back to rewrite for large deletes;
  *  - OPTIMIZE applies DVs physically and drops the entries; vacuum
  *    GCs superseded/unreferenced DV files but keeps every file a
  *    retained version references;
  *  - the change-feed contracts treat a DV commit exactly like a
  *    rewrite (CDC carries it; the append-only feed refuses it);
  *  - a concurrent DV on a segment another DML read is a TRUE
  *    conflict (re-plan), never a lost update.
  */
class LakeDvSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** 2-segment lake: ids 0-4 (seg_b0), 10-14 (seg_b1); flag = id % 2. */
  private def buildLake(): String = {
    val dir = tmp("graft_dv_lake")
    import spark.implicits._
    (0 until 2).foreach { i =>
      val rows = (0 until 5).map(j => (i * 10L + j, (i * 10L + j) % 2))
      rows.toDF("id", "flag").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/seg_b$i")
      val m = LakeSink.readManifest(dir)
      require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
        m.segs :+ s"seg_b$i"))
    }
    dir
  }

  private def ids(dir: String): Seq[Long] =
    LakeSink.readTable(spark, dir).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("point delete writes a DV (no rewrite, no drop); every read " +
      "reconciles; time travel sees the pre-delete rows") {
    val dir = buildLake()
    val (v, rw, dropped, nDel) = LakeSink.deleteWhere(spark, dir,
      col("id") === 3L, dvMaxFraction = 0.5)
    assert((rw, dropped, nDel) === ((0, 0, 1L)))
    val m = LakeSink.readManifest(dir)
    assert(m.version === v)
    assert(m.segs.sorted === Seq("seg_b0", "seg_b1"), "segments survive")
    assert(m.dv.keySet === Set("seg_b0") && m.dv("seg_b0").rows === 1L)
    assert(ids(dir) === Seq(0L, 1L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
    // time travel: the pre-delete version has no DV and shows id 3
    assert(LakeSink.readTableAsOf(spark, dir, v - 1).count() === 10L)
    // the DV file is O(deleted rows): one position recorded
    assert(spark.read.parquet(
      s"$dir/_dv/${m.dv("seg_b0").file}").count() === 1L)
  }

  test("a second point delete supersedes the segment's DV with the " +
      "union (files immutable)") {
    val dir = buildLake()
    LakeSink.deleteWhere(spark, dir, col("id") === 3L, dvMaxFraction = 0.5)
    val f1 = LakeSink.readManifest(dir).dv("seg_b0").file
    LakeSink.deleteWhere(spark, dir, col("id") === 1L, dvMaxFraction = 0.5)
    val m = LakeSink.readManifest(dir)
    assert(m.dv("seg_b0").file !== f1, "new DV file, not in-place edit")
    assert(m.dv("seg_b0").rows === 2L)
    assert(ids(dir) === Seq(0L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
    // re-deleting an already-hidden row is a no-op commit
    val (v, rw, dr, n) = LakeSink.deleteWhere(spark, dir,
      col("id") === 3L, dvMaxFraction = 0.5)
    assert((rw, dr, n) === ((0, 0, 0L)) && v === m.version)
  }

  test("fully-matching segments drop by metadata even in DV mode; the " +
      "fraction guard falls back to rewrite for large deletes") {
    val dir = buildLake()
    // seg_b1 fully matches id >= 10 → dropped, no DV
    val (_, rw, dropped, nDel) = LakeSink.deleteWhere(spark, dir,
      col("id") >= 10L, dvMaxFraction = 0.5)
    assert((rw, dropped, nDel) === ((0, 1, 5L)))
    assert(LakeSink.readManifest(dir).dv.isEmpty)
    // 2 of 5 live rows (40%) > 20% fraction → copy-on-write rewrite
    val (_, rw2, _, nDel2) = LakeSink.deleteWhere(spark, dir,
      col("flag") === 1L, dvMaxFraction = 0.2)
    assert(rw2 === 1 && nDel2 === 2L)
    assert(LakeSink.readManifest(dir).dv.isEmpty)
    assert(ids(dir) === Seq(0L, 2L, 4L))
  }

  test("OPTIMIZE applies DVs physically and drops the entries; the " +
      "pre-compaction version still reconciles under its own DV") {
    val dir = buildLake()
    val (vDel, _, _, _) = LakeSink.deleteWhere(spark, dir,
      col("id") === 3L, dvMaxFraction = 0.5)
    val (vComp, nIn) = LakeSink.compact(spark, dir, targetFiles = 1)
    assert(nIn === 2)
    val m = LakeSink.readManifest(dir)
    assert(m.version === vComp && m.dv.isEmpty && m.segs.size === 1)
    assert(ids(dir) === Seq(0L, 1L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
    // the DV'd version still time-travels correctly (9 rows), the
    // pre-delete one shows all 10
    assert(LakeSink.readTableAsOf(spark, dir, vDel).count() === 9L)
    assert(LakeSink.readTableAsOf(spark, dir, vDel - 1).count() === 10L)
  }

  test("a single-segment lake with a DV is still compactable " +
      "(the purge-DV maintenance op)") {
    val dir = tmp("graft_dv_one")
    import spark.implicits._
    (0L until 5L).map(i => (i, i % 2)).toDF("id", "flag").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/seg_b0")
    require(LakeSink.commitManifest(dir, 1L, 0L, Seq("seg_b0")))
    LakeSink.deleteWhere(spark, dir, col("id") === 2L, dvMaxFraction = 0.5)
    val (_, nIn) = LakeSink.compact(spark, dir, targetFiles = 1)
    assert(nIn === 1)
    assert(LakeSink.readManifest(dir).dv.isEmpty)
    assert(ids(dir) === Seq(0L, 1L, 3L, 4L))
  }

  test("vacuum GCs superseded and unreferenced DV files, keeps the " +
      "ones retained versions reference") {
    val dir = buildLake()
    LakeSink.deleteWhere(spark, dir, col("id") === 3L, dvMaxFraction = 0.5)
    LakeSink.deleteWhere(spark, dir, col("id") === 1L, dvMaxFraction = 0.5)
    val live = LakeSink.readManifest(dir).dv("seg_b0").file
    val dvDir = new java.io.File(s"$dir/_dv")
    assert(dvDir.list().toSet.size === 2, "superseded file still on disk")
    // retain 1 version: only the tip's DV file survives
    LakeSink.vacuum(dir, retainVersions = 1)
    assert(dvDir.list().toSet === Set(live))
    assert(ids(dir) === Seq(0L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
  }

  test("UPDATE and MERGE on a DV'd segment respect hidden rows and " +
      "pay off the DV debt in their rewrite") {
    val dir = buildLake()
    LakeSink.deleteWhere(spark, dir, col("id") === 3L, dvMaxFraction = 0.5)
    // update touches seg_b0; the rewrite must NOT resurrect id 3
    val (_, rw, nUpd) = LakeSink.updateWhere(spark, dir, col("id") < 5L,
      Map("flag" -> (col("flag") + 10L)))
    assert(rw === 1 && nUpd === 4L, "only live rows match")
    val m = LakeSink.readManifest(dir)
    assert(m.dv.isEmpty, "rewrite retired the dv entry")
    assert(ids(dir) === Seq(0L, 1L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))

    // merge on a fresh lake with a DV: a source row keyed like a
    // HIDDEN row must INSERT, not match
    val dir2 = buildLake()
    LakeSink.deleteWhere(spark, dir2, col("id") === 3L, dvMaxFraction = 0.5)
    import spark.implicits._
    val (_, _, nU, nI) = LakeSink.mergeInto(spark, dir2,
      Seq((3L, 99L)).toDF("id", "flag"), Seq("id"))
    assert(nU === 0L && nI === 1L, "hidden row is not a merge match")
    assert(LakeSink.readTable(spark, dir2).filter(col("id") === 3L)
      .select("flag").head().getLong(0) === 99L)
  }

  test("CDC: a DV-backed delete feeds the change feed; without cdc " +
      "both feeds refuse the window loudly") {
    val dir = buildLake()
    val (v, _, _, _) = LakeSink.deleteWhere(spark, dir, col("id") === 3L,
      cdc = true, dvMaxFraction = 0.5)
    val rows = LakeSink.changesCdcBetween(spark, dir, 2L, v)
      .select("_change_type", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("delete", 3L)))
    // a cdc-less DV delete: CDC walk refuses (names the dv), and the
    // append-only feed refuses too
    val dir2 = buildLake()
    val (v2, _, _, _) = LakeSink.deleteWhere(spark, dir2, col("id") === 3L,
      dvMaxFraction = 0.5)
    val e = intercept[Exception] {
      LakeSink.changesCdcBetween(spark, dir2, 2L, v2).collect()
    }
    assert(e.getMessage.contains("deletion-vector"))
    val e2 = intercept[Exception] {
      LakeSink.changesBetween(spark, dir2, 2L, v2).collect()
    }
    assert(e2.getMessage.contains("deletion vectors"))
  }

  test("stats pruning stays sound over DV'd segments (stale bounds " +
      "are a superset, hidden rows never resurface)") {
    val dir = tmp("graft_dv_stats")
    import spark.implicits._
    val df = (0L until 10L).map(i => (i, i * 100L)).toDF("id", "ts")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/seg_b0")
    val stats = LakeSink.segmentStats(
      spark.read.parquet(s"$dir/seg_b0"), Seq("ts"))
    require(LakeSink.commitManifest(dir, 1L, 0L, Seq("seg_b0"),
      stats = Map("seg_b0" -> stats)))
    // hide ts=900 behind a DV; recorded max stays 900 (stale, sound)
    LakeSink.deleteWhere(spark, dir, col("ts") === 900L,
      dvMaxFraction = 0.5)
    val (pruned, scanned, total) =
      LakeSink.readTableWhere(spark, dir, "ts", 850L, 1000L)
    assert(scanned.size === 1 && total === 1,
      "stale bounds still admit the segment")
    assert(pruned.count() === 0L, "the hidden row does not resurface")
  }

  test("a concurrent DV landing on a segment this delete read is a " +
      "TRUE conflict: re-plan, both deletes apply (no lost update)") {
    val dir = buildLake()
    var injected = false
    LakeSink.deleteWhere(spark, dir, col("id") === 3L,
      dvMaxFraction = 0.5,
      beforeCommit = () => {
        if (!injected) {
          injected = true
          // lands first, so the outer delete's CAS loses and must
          // re-plan (its staged DV was computed pre-this-DV)
          LakeSink.deleteWhere(spark, dir, col("id") === 1L,
            dvMaxFraction = 0.5)
        }
      })
    assert(ids(dir) === Seq(0L, 2L, 4L, 10L, 11L, 12L, 13L, 14L))
    assert(LakeSink.readManifest(dir).dv("seg_b0").rows === 2L)
  }
}
