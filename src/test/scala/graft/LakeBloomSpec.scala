package graft

import graft.streaming.{LakeCatalog, LakeSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BLOOM-FILTER SEGMENT SKIPPING (r12) — per-segment sidecars that
  * answer point-predicate questions min/max stats cannot. What must
  * hold:
  *
  *  - declaration is a metadata-only commit; subsequent staged
  *    segments write sidecars, PRE-declaration segments stay
  *    sidecar-less and are ALWAYS scanned (advisory contract);
  *  - a point read on a high-cardinality column with uniform layout
  *    (every segment's [min,max] spans every probe — range pruning
  *    powerless) bloom-prunes to the segment(s) that may hold the
  *    key, and a definitely-absent key prunes EVERY segment with the
  *    correct empty result;
  *  - results are ALWAYS identical to the unpruned read (bloom = a
  *    may-contain bound, never an answer);
  *  - string columns work (typed probe);
  *  - point DML (DELETE WHERE id = x) plans its touched-set through
  *    the same hints: unpruned segments survive BY REFERENCE;
  *  - rewrites/DML on a bloom-declared table produce sidecars for the
  *    NEW segments; vacuum GCs sidecars of dead segments;
  *  - RENAME COLUMN (column mapping) keeps pruning working: sidecars
  *    key physical names, probes re-key logical → physical.
  */
class LakeBloomSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** 8 segments of 200 rows each; ids are STRIDED so every segment's
    * [min,max] covers the full id space — min/max stats can never
    * prune a point probe, only the bloom can. */
  private def buildStrided(bloom: Boolean): String = {
    val dir = tmp("graft_bloom_lake")
    LakeSink.createTable(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
    if (bloom) LakeSink.setBloomColumns(spark, dir, Seq("id", "tag"))
    (0 until 8).foreach { s =>
      val rows = (0 until 200).map { i =>
        val id = i.toLong * 8L + s // segment s holds ids ≡ s (mod 8)
        (id, s"t$id", id * 10L)
      }
      LakeSink.appendSegment(spark, dir, rows.toDF("id", "tag", "v"),
        f"seg_b$s%02d")
    }
    dir
  }

  test("point read bloom-prunes where min/max cannot; results exact") {
    val dir = buildStrided(bloom = true)
    // id 13 ≡ 5 (mod 8) → lives in segment 5 only; every segment's
    // range covers it
    val (df, scanned, total) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(13L))
    assert(total === 8)
    assert(scanned.contains("seg_b05"))
    assert(scanned.size < 8, s"bloom failed to prune: scanned $scanned")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((13L, "t13")))
    // multi-value probe: ids from two segments
    val (df2, scanned2, _) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(13L, 16L)) // 5 and 0 (mod 8)
    assert(Set("seg_b05", "seg_b00").subsetOf(scanned2.toSet))
    assert(df2.count() === 2L)
    // definitely-absent id: beyond the domain → every bloom excludes
    val (df3, scanned3, _) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(999999L))
    assert(scanned3.isEmpty)
    assert(df3.count() === 0L)
    // string probe
    val (df4, scanned4, _) = LakeSink.readTableWhereIn(
      spark, dir, "tag", Seq("t13"))
    assert(scanned4.size < 8)
    assert(df4.head.getLong(0) === 13L)
  }

  test("pre-declaration segments are advisory (always scanned); exactness holds") {
    val dir = buildStrided(bloom = false)
    // declare AFTER the fact: existing segments have no sidecars
    LakeSink.setBloomColumns(spark, dir, Seq("id"))
    val (df, scanned, total) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(13L))
    assert(scanned.size === total) // nothing prunable, nothing wrong
    assert(df.count() === 1L)
    // a NEW append writes a sidecar and becomes prunable
    LakeSink.appendSegment(spark, dir,
      Seq((5000L, "t5000", 1L)).toDF("id", "tag", "v"), "seg_new")
    val (_, scanned2, _) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(5000L))
    assert(scanned2.contains("seg_new"))
    val (df3, scanned3, _) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(13L))
    // the new segment's bloom excludes 13 — old segments still scan
    assert(!scanned3.contains("seg_new") && scanned3.size === total)
    assert(df3.count() === 1L)
  }

  test("point DELETE plans its touched-set through the bloom") {
    val dir = buildStrided(bloom = true)
    val m0 = LakeSink.readManifest(dir)
    val (v, rewritten, dropped, deleted) =
      LakeSink.deleteWhere(spark, dir, col("id") === 13L)
    assert(v === m0.version + 1 && deleted === 1L && dropped === 0)
    assert(rewritten < 8,
      s"bloom hint failed: DELETE rewrote $rewritten of 8 segments")
    val m1 = LakeSink.readManifest(dir)
    // unpruned segments survive BY REFERENCE
    assert(m0.segs.filter(_ != "seg_b05").forall(m1.segs.contains))
    assert(LakeSink.readTable(spark, dir).filter(col("id") === 13L)
      .count() === 0L)
    // the rewritten segment got a FRESH sidecar: 13 is gone from it
    val (_, scanned, _) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(13L))
    assert(scanned.isEmpty)
  }

  test("vacuum GCs sidecars of dead segments; live ones survive") {
    val dir = buildStrided(bloom = true)
    LakeSink.deleteWhere(spark, dir, col("id") === 13L) // rewrites seg_b05
    val bloomDir = java.nio.file.Paths.get(dir, "_blooms")
    def files() = org.apache.commons.io.FileUtils
      .listFiles(bloomDir.toFile, null, false)
      .toArray.map(_.toString).toSeq
    assert(files().exists(_.contains("seg_b05."))) // dead but retained
    LakeSink.vacuum(dir, retainVersions = 1)
    val after = files()
    assert(!after.exists(_.contains("seg_b05.")),
      s"dead segment's sidecars survived vacuum: $after")
    // live segments keep theirs — pruning still works
    val (_, scanned, _) = LakeSink.readTableWhereIn(
      spark, dir, "id", Seq(14L)) // ≡ 6 (mod 8)
    assert(scanned.size < LakeSink.readManifest(dir).segs.size)
  }

  test("RENAME COLUMN keeps bloom pruning working (physical-name keying)") {
    val dir = buildStrided(bloom = true)
    LakeSink.evolveRenameColumn(spark, dir, "id", "doc_id")
    val (df, scanned, total) = LakeSink.readTableWhereIn(
      spark, dir, "doc_id", Seq(13L))
    assert(total === 8 && scanned.size < 8)
    assert(df.head.getLong(0) === 13L)
    // DML under the new name still prunes
    val (_, rewritten, _, deleted) =
      LakeSink.deleteWhere(spark, dir, col("doc_id") === 21L)
    assert(deleted === 1L && rewritten < 8)
  }

  test("ANALYZE backfills stats + bloom sidecars for pre-declaration segments") {
    val dir = buildStrided(bloom = false) // ingested with NO declaration
    LakeSink.setBloomColumns(spark, dir, Seq("id"))
    val tbl = "graft_bloom_an"
    LakeCatalog.register(tbl, dir)
    try {
      val v0 = LakeSink.readManifest(dir).version
      val rec = spark.sql(
        s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS id, v").head()
      assert(rec.getInt(1) === 8) // every segment backfilled
      val m = LakeSink.readManifest(dir)
      assert(m.version === v0 + 1) // ONE metadata commit
      assert(m.segs.forall(s => m.stats.get(s).exists(_.contains("id"))))
      // pruning works retroactively, no rewrite happened
      val (df, scanned, total) = LakeSink.readTableWhereIn(
        spark, dir, "id", Seq(13L))
      assert(total === 8 && scanned.size < 8)
      assert(df.count() === 1L)
      // idempotent: a second run analyzes nothing, commits nothing
      val rec2 = spark.sql(
        s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS id, v").head()
      assert(rec2.getInt(1) === 0)
      assert(LakeSink.readManifest(dir).version === m.version)
    } finally LakeCatalog.unregister(tbl)
  }

  test("declaration survives clone and rejects bad columns") {
    val dir = buildStrided(bloom = true)
    assert(LakeSink.readManifest(dir).bloomCols === Seq("id", "tag"))
    intercept[Exception] {
      LakeSink.setBloomColumns(spark, dir, Seq("nope"))
    }
    val dst = tmp("graft_bloom_clone")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dst))
    LakeSink.cloneTable(spark, dir, dst)
    assert(LakeSink.readManifest(dst).bloomCols === Seq("id", "tag"))
  }
}
