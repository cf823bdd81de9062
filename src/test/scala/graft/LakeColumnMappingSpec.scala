package graft

import graft.streaming.{LakeCatalog, LakeSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COLUMN MAPPING (r12): RENAME/DROP COLUMN as METADATA-ONLY schema
  * evolution (Delta columnMapping=name / Iceberg field-id analog).
  * The manifest maps each LOGICAL column name to the STABLE PHYSICAL
  * name written in parquet files; the first rename/drop activates the
  * map as identity over the then-current schema. What must hold:
  *
  *  - rename rewrites ZERO segments (same segment list, new version);
  *    reads surface the new name, the old name is gone;
  *  - drop hides the column everywhere; the bytes linger unselected
  *    until the next OPTIMIZE physically sheds them;
  *  - re-adding a dropped name mints a FRESH physical id — old data
  *    can never resurrect through the applied-schema read;
  *  - time travel reads each version under ITS OWN names (schema
  *    travel includes name travel);
  *  - the change feed reads windows straddling a rename through the
  *    stable physical ids, surfacing end-of-window logical names;
  *  - DML and stats pruning keep working across the rename (hints
  *    re-key logical → physical);
  *  - OPTIMIZE re-baselines: the compacted file physically carries
  *    the logical names and the mapping deactivates;
  *  - the SQL surface: ALTER TABLE … RENAME/DROP/ADD COLUMN on a
  *    registered lake, delegate untouched elsewhere.
  */
class LakeColumnMappingSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** 2-segment lake with stats on (id): ids 0-4 (seg_b0), 10-14
    * (seg_b1); flag = id % 2. Schema recorded (evolution base). */
  private def buildLake(): String = {
    val dir = tmp("graft_cm_lake")
    import spark.implicits._
    LakeSink.createTable(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("flag",
        org.apache.spark.sql.types.LongType))))
    (0 until 2).foreach { i =>
      val rows = (0 until 5).map(j => (i * 10L + j, (i * 10L + j) % 2))
      LakeSink.appendSegment(spark, dir,
        rows.toDF("id", "flag").coalesce(1), s"seg_b$i")
    }
    // record stats for both columns (pruning lever)
    val m = LakeSink.readManifest(dir)
    val stats = m.segs.map(s => s -> LakeSink.segmentStats(
      spark.read.parquet(s"$dir/$s"), Seq("id", "flag"))).toMap
    require(LakeSink.commitNext(dir, m, m.copy(version = m.version + 1,
      stats = stats, cdcSegs = Nil)))
    dir
  }

  test("RENAME COLUMN is metadata-only; reads, DML, and stats pruning " +
      "work under the new name") {
    val dir = buildLake()
    val segsBefore = LakeSink.readManifest(dir).segs
    LakeSink.evolveRenameColumn(spark, dir, "id", "event_id")
    val m = LakeSink.readManifest(dir)
    assert(m.segs === segsBefore, "rename must not touch any segment")
    assert(m.colmap === Map("event_id" -> "id", "flag" -> "flag"))
    // reads speak the new logical name; the old one is gone
    val df = LakeSink.readTable(spark, dir)
    assert(df.columns.toSeq === Seq("event_id", "flag"))
    assert(df.agg(sum("event_id")).head.getLong(0) === 70L)
    // stats pruning re-keys: probing [10,14] scans ONLY seg_b1
    val (pruned, scanned, total) =
      LakeSink.readTableWhere(spark, dir, "event_id", 10L, 14L)
    assert(total === 2 && scanned === Seq("seg_b1"))
    assert(pruned.count() === 5L)
    // DML with a predicate on the RENAMED column: prunes + rewrites
    val (_, rw, dropped, nDel) =
      LakeSink.deleteWhere(spark, dir, col("event_id") === 11L)
    assert(rw === 1 && dropped === 0 && nDel === 1L)
    assert(LakeSink.readTable(spark, dir).agg(sum("event_id"))
      .head.getLong(0) === 59L)
    // the rewritten segment physically carries the PHYSICAL name
    val newSeg = LakeSink.readManifest(dir).segs
      .filterNot(segsBefore.contains).head
    assert(spark.read.parquet(s"$dir/$newSeg").columns.toSeq ===
      Seq("id", "flag"))
  }

  test("appendSegment after a rename accepts the new logical name and " +
      "writes the stable physical one") {
    val dir = buildLake()
    LakeSink.evolveRenameColumn(spark, dir, "id", "event_id")
    import spark.implicits._
    LakeSink.appendSegment(spark, dir,
      Seq((20L, 0L)).toDF("event_id", "flag").coalesce(1), "seg_b2")
    assert(spark.read.parquet(s"$dir/seg_b2").columns.toSeq ===
      Seq("id", "flag"), "file columns must be the physical names")
    assert(LakeSink.readTable(spark, dir).filter(col("event_id") === 20L)
      .count() === 1L)
    // and the OLD logical name is refused
    val e = intercept[Exception] {
      LakeSink.appendSegment(spark, dir,
        Seq((21L, 0L)).toDF("id", "flag"), "seg_b3")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("DROP COLUMN hides the data; a re-added name mints a fresh " +
      "physical id and never resurrects it") {
    val dir = buildLake()
    LakeSink.evolveDropColumn(spark, dir, "flag")
    val vDropped = LakeSink.readManifest(dir).version
    assert(LakeSink.readTable(spark, dir).columns.toSeq === Seq("id"))
    // time travel BEFORE the drop still shows the column and its data
    assert(LakeSink.readTableAsOf(spark, dir, vDropped - 1)
      .agg(sum("flag")).head.getLong(0) === 4L)
    // re-add the SAME logical name: fresh physical id, all NULL
    LakeSink.evolveAddColumn(spark, dir, "flag",
      org.apache.spark.sql.types.LongType)
    val m = LakeSink.readManifest(dir)
    assert(m.colmap("flag") !== "flag",
      s"re-added column must not reuse the dropped physical id, got " +
        m.colmap("flag"))
    val back = LakeSink.readTable(spark, dir)
    assert(back.columns.toSeq === Seq("id", "flag"))
    assert(back.filter(col("flag").isNotNull).count() === 0L,
      "dropped data resurrected through a reused physical name")
  }

  test("OPTIMIZE re-baselines: compacted file carries logical names, " +
      "mapping deactivates, dropped bytes are shed") {
    val dir = buildLake()
    LakeSink.evolveRenameColumn(spark, dir, "id", "event_id")
    LakeSink.evolveDropColumn(spark, dir, "flag")
    val (v, n) = LakeSink.compact(spark, dir, targetFiles = 1)
    assert(n === 2)
    val m = LakeSink.readManifest(dir)
    assert(m.version === v && m.colmap.isEmpty,
      "compaction must re-baseline the mapping")
    val cseg = m.segs.head
    assert(spark.read.parquet(s"$dir/$cseg").columns.toSeq ===
      Seq("event_id"),
      "compacted file must physically carry the logical name and shed " +
        "the dropped column")
    assert(LakeSink.readTable(spark, dir).agg(sum("event_id"))
      .head.getLong(0) === 70L)
    // stats re-keyed to the new baseline: pruning works post-compact
    // (single segment, so just assert the probe answers correctly)
    val (pruned, _, _) =
      LakeSink.readTableWhere(spark, dir, "event_id", 10L, 14L)
    assert(pruned.count() === 5L)
  }

  test("time travel is name travel: VERSION AS OF before the rename " +
      "reads the old column names") {
    val dir = buildLake()
    val vPre = LakeSink.readManifest(dir).version
    LakeSink.evolveRenameColumn(spark, dir, "id", "event_id")
    assert(LakeSink.readTableAsOf(spark, dir, vPre).columns.toSeq ===
      Seq("id", "flag"))
    assert(LakeSink.readTable(spark, dir).columns.toSeq ===
      Seq("event_id", "flag"))
  }

  test("the change feed reads windows straddling a rename through " +
      "stable physical ids, surfacing end-of-window names") {
    val dir = buildLake()
    val v0 = LakeSink.readManifest(dir).version
    // pre-rename CDC delete writes cdc files under physical name "id"
    val (v1, _, _, n1) =
      LakeSink.deleteWhere(spark, dir, col("id") === 0L, cdc = true)
    assert(n1 === 1L)
    LakeSink.evolveRenameColumn(spark, dir, "id", "event_id")
    // post-rename CDC delete writes cdc files under the SAME physical
    val (v2, _, _, n2) =
      LakeSink.deleteWhere(spark, dir, col("event_id") === 10L, cdc = true)
    assert(n2 === 1L)
    val feed = LakeSink.changesCdcBetween(spark, dir, v0, v2)
    assert(feed.columns.toSeq ===
      Seq("event_id", "flag", "_change_type", "_commit_version"))
    val deletes = feed.filter(col("_change_type") === "delete")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(deletes === Seq(0L, 10L),
      "pre-rename cdc rows must surface under the post-rename name")
  }

  test("MERGE after a rename: key pruning re-keys and post-images " +
      "carry the new schema") {
    val dir = buildLake()
    LakeSink.evolveRenameColumn(spark, dir, "id", "event_id")
    import spark.implicits._
    val (_, rw, nUpd, nIns) = LakeSink.mergeInto(spark, dir,
      Seq((11L, 9L), (20L, 9L)).toDF("event_id", "flag"),
      Seq("event_id"), cdc = true)
    // key range [11,20] straddles only seg_b1 ([10,14]) — seg_b0 is
    // pruned from the rewrite by the re-keyed stats
    assert(rw === 1 && nUpd === 1L && nIns === 1L)
    val t = LakeSink.readTable(spark, dir)
    assert(t.filter(col("event_id") === 11L).head.getLong(1) === 9L)
    assert(t.count() === 11L)
  }

  test("rename refuses when it would break a registered expectation") {
    val dir = buildLake()
    LakeSink.addExpectation(spark, dir, "flag_domain", "flag IN (0, 1)")
    val e = intercept[Exception] {
      LakeSink.evolveRenameColumn(spark, dir, "flag", "f2") }
    assert(e.getMessage.contains("flag_domain"))
    val e2 = intercept[Exception] {
      LakeSink.evolveDropColumn(spark, dir, "flag") }
    assert(e2.getMessage.contains("flag_domain"))
    // renaming an UNRELATED column is fine
    LakeSink.evolveRenameColumn(spark, dir, "id", "event_id")
  }

  test("SQL: ALTER TABLE RENAME/DROP/ADD COLUMN drive the mapping on " +
      "a registered lake") {
    val dir = buildLake()
    val tbl = "graft_cm_" + java.util.UUID.randomUUID.toString.take(8)
    LakeCatalog.register(tbl, dir)
    try {
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN id TO event_id").collect()
      assert(spark.sql(s"SELECT sum(event_id) FROM $tbl")
        .head.getLong(0) === 70L)
      spark.sql(s"ALTER TABLE $tbl DROP COLUMN flag").collect()
      assert(spark.table(tbl).columns.toSeq === Seq("event_id"))
      spark.sql(s"ALTER TABLE $tbl ADD COLUMN note STRING").collect()
      assert(spark.table(tbl).columns.toSeq === Seq("event_id", "note"))
      // delegate untouched: ALTER over an unregistered name still
      // fails with Spark's own resolution error, not ours
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE graft_cm_nope RENAME COLUMN a TO b")
          .collect() }
      assert(!e.getMessage.contains("manifest"))
    } finally LakeCatalog.unregister(tbl)
  }
}
