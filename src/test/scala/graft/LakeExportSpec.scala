package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{LakeCatalog, LakeSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EXPORT TABLE ([[LakeSink.exportTable]], r16) — the lake's interop
  * escape hatch: the current version as plain parquet with NO protocol
  * left in it (no manifest, no deletion vectors, logical names, one
  * uniform schema), so a reader with zero graft knowledge sees exactly
  * what readTable returns. Zero-copy (hard links) for protocol-clean
  * segments, a single batched rewrite for the rest.
  */
class LakeExportSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  /** fileKey (inode) equality — proof a file was linked, not copied. */
  private def sameInode(a: java.nio.file.Path, b: java.nio.file.Path): Boolean =
    Files.readAttributes(a, classOf[java.nio.file.attribute.BasicFileAttributes])
      .fileKey == Files.readAttributes(
        b, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey

  private def mkLake(dir: String, n: Long = 40L): Unit = {
    import spark.implicits._
    val df = (0L until n).map(i => (i, i % 4, s"p$i")).toDF("id", "flag", "payload")
    LakeSink.createTable(dir, df.schema)
    LakeSink.appendSegment(spark, dir, df.filter(col("id") < n / 2), "seg_a")
    LakeSink.appendSegment(spark, dir, df.filter(col("id") >= n / 2), "seg_b")
  }

  test("export = readTable through a PLAIN reader; DV'd segments rewrite, clean segments hard-link") {
    val dir = tmp("graft_exp_lake")
    mkLake(dir)
    // DV-delete rows only in seg_a (ids 0..19): flag==1 & id<20
    val (_, rw, _, nDel) = LakeSink.deleteWhere(spark, dir,
      col("flag") === 1L && col("id") < 20L, dvMaxFraction = 1.0)
    assert(rw === 0 && nDel > 0, s"test shape broke: rw=$rw nDel=$nDel")
    assert(LakeSink.readManifest(dir).dv.keySet === Set("seg_a"))

    val out = tmp("graft_exp_out")
    val (v, linked, rewritten, rows) = LakeSink.exportTable(spark, dir, out)
    assert(v === LakeSink.readManifest(dir).version)
    assert(rewritten === 1, "only the DV'd segment needed rewriting")
    assert(linked > 0, "the clean segment should hard-link")
    assert(rows === 40L - nDel)

    // a PLAIN reader — no graft code — sees exactly readTable
    val plain = spark.read.parquet(out).select("id", "flag", "payload")
      .collect().map(_.toSeq).toSet
    val engine = LakeSink.readTable(spark, dir)
      .select("id", "flag", "payload").collect().map(_.toSeq).toSet
    assert(plain === engine, "plain read diverges from readTable")
    // deleted rows really absent from the exported BYTES
    assert(!plain.exists(r => r(1) == 1L && r.head.asInstanceOf[Long] < 20L))

    // no protocol artifacts escaped
    assert(!Files.exists(Paths.get(out, "_manifest")))
    assert(!Files.exists(Paths.get(out, "_dv")))

    // flat layout: no subdirectories at all in the export
    assert(Files.list(Paths.get(out)).toArray
      .forall(p => Files.isRegularFile(p.asInstanceOf[java.nio.file.Path])),
      "export is not a flat directory of files")
    // zero-copy proof: every seg_b parquet file shares an inode
    val srcFiles = Files.list(Paths.get(dir, "seg_b")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    assert(srcFiles.nonEmpty)
    srcFiles.foreach { f =>
      val name = Paths.get(f).getFileName.toString
      assert(sameInode(Paths.get(f), Paths.get(out, s"seg_b__$name")),
        s"$name was copied, not linked")
    }
  }

  test("export refuses a non-empty target; later source DML never mutates exported bytes") {
    val dir = tmp("graft_exp_lake2")
    mkLake(dir)
    val out = tmp("graft_exp_out2")
    LakeSink.exportTable(spark, dir, out)
    val e = intercept[IllegalArgumentException] {
      LakeSink.exportTable(spark, dir, out)
    }
    assert(e.getMessage.contains("already holds files"))
    // snapshot independence: DML + vacuum on the source, export unchanged
    val before = spark.read.parquet(out).count()
    LakeSink.deleteWhere(spark, dir, col("flag") === 0L)
    LakeSink.vacuum(dir, retainVersions = 1)
    assert(spark.read.parquet(out).count() === before)
  }

  test("column-mapped and schema-evolved lakes export LOGICAL names and a uniform schema") {
    import spark.implicits._
    val dir = tmp("graft_exp_lake3")
    mkLake(dir)
    val tbl = "graft_exp_sql_" + System.nanoTime()
    LakeCatalog.register(tbl, dir)
    try {
      // rename → active column mapping (physical ids on disk); add a
      // column → the two original segments' footers are now STALE
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN payload TO body").collect()
      spark.sql(s"ALTER TABLE $tbl ADD COLUMN score BIGINT").collect()
      LakeSink.appendSegment(spark, dir,
        Seq((100L, 0L, "new", 7L)).toDF("id", "flag", "body", "score"),
        "seg_c")
      val out = tmp("graft_exp_out3")
      val (_, linked, rewritten, _) = LakeSink.exportTable(spark, dir, out)
      // colmap active → NOTHING may hard-link (files carry physical ids)
      assert(linked === 0 && rewritten === 3,
        s"mapped lake must rewrite everything: linked=$linked rw=$rewritten")
      // every exported FILE individually carries the full logical schema
      val files = Files.walk(Paths.get(out)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.foreach { f =>
        assert(spark.read.parquet(f).schema.fieldNames.toSeq ==
          Seq("id", "flag", "body", "score"), s"ragged schema in $f")
      }
      val plain = spark.read.parquet(out)
      assert(plain.count() === 41L)
      assert(plain.filter(col("score").isNull).count() === 40L)
    } finally LakeCatalog.unregister(tbl)
  }

  test("time-travel export: any retained version, vacuumed versions refuse loud") {
    import spark.implicits._
    val dir = tmp("graft_exp_lake_tt")
    mkLake(dir) // v1 create, v2 seg_a, v3 seg_b
    val preV = LakeSink.readManifest(dir).version
    // v4: DV-delete, v5: append more — the tip diverges from preV
    LakeSink.deleteWhere(spark, dir, col("flag") === 2L, dvMaxFraction = 1.0)
    LakeSink.appendSegment(spark, dir,
      Seq((500L, 9L, "late")).toDF("id", "flag", "payload"), "seg_z")
    val out = tmp("graft_exp_out_tt")
    val (v, _, rewritten, rows) =
      LakeSink.exportTable(spark, dir, out, version = Some(preV))
    assert(v === preV && rewritten === 0, s"v=$v rw=$rewritten")
    assert(rows === 40L)
    // the exported bytes equal the TABLE AS OF that version — deleted
    // rows present (the delete came later), seg_z absent
    val plain = spark.read.parquet(out).select("id", "flag", "payload")
      .collect().map(_.toSeq).toSet
    val asOf = LakeSink.readTableAsOf(spark, dir, preV)
      .select("id", "flag", "payload").collect().map(_.toSeq).toSet
    assert(plain === asOf)
    assert(plain.exists(_(1) == 2L), "pre-delete rows missing")
    assert(!plain.exists(_.head == 500L), "post-version row leaked in")
    // SQL spelling
    val out2 = tmp("graft_exp_out_tt2")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
    val tbl = "graft_exp_tt_" + System.nanoTime()
    LakeCatalog.register(tbl, dir)
    try {
      val r = spark.sql(
        s"EXPORT TABLE $tbl VERSION AS OF $preV TO '$out2'").collect().head
      assert(r.getLong(0) === preV && r.getLong(3) === 40L)
    } finally LakeCatalog.unregister(tbl)
    // beyond the vacuum horizon the export refuses loud
    LakeSink.vacuum(dir, retainVersions = 1)
    val e = intercept[IllegalArgumentException] {
      LakeSink.exportTable(spark, dir, tmp("graft_exp_out_tt3"),
        version = Some(2L))
    }
    assert(e.getMessage.contains("export horizon"))
  }

  test("SQL EXPORT TABLE: receipt + delegate non-interference") {
    val dir = tmp("graft_exp_lake4")
    mkLake(dir)
    val tbl = "graft_exp_sql4_" + System.nanoTime()
    LakeCatalog.register(tbl, dir)
    try {
      val out = tmp("graft_exp_out4")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val r = spark.sql(s"EXPORT TABLE $tbl TO '$out'").collect().head
      assert(r.getLong(0) >= 1L) // version
      assert(r.getInt(1) > 0 && r.getInt(2) === 0) // all linked, none rewritten
      assert(r.getLong(3) === 40L)
      assert(spark.read.parquet(out).count() === 40L)
      // an EXPORT over an UNREGISTERED name must reach the delegate
      // parser (and fail there), not be half-claimed by the extension
      intercept[Exception] {
        spark.sql("EXPORT TABLE not_a_lake TO '/tmp/nope'").collect()
      }
      // and ordinary SQL still parses through the delegate untouched
      assert(spark.sql("SELECT 1 AS one").collect().head.getInt(0) === 1)
    } finally LakeCatalog.unregister(tbl)
  }
}
