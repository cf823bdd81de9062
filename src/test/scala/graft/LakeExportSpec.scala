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
    val (v, linked, copied, rewritten, rows) =
      LakeSink.exportTable(spark, dir, out)
    assert(v === LakeSink.readManifest(dir).version)
    assert(rewritten === 1, "only the DV'd segment needed rewriting")
    assert(linked > 0, "the clean segment should hard-link")
    assert(copied === 0, "same-filesystem target must never copy")
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

    // flat layout: no subdirectories at all in the export (the
    // _-prefixed receipt is a regular file readers' globs never see)
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
      val (_, linked, _, rewritten, _) =
        LakeSink.exportTable(spark, dir, out)
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
    val (v, _, _, rewritten, rows) =
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
      assert(r.getLong(0) === preV && r.getLong(4) === 40L)
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
      // all linked, none copied, none rewritten
      assert(r.getInt(1) > 0 && r.getInt(2) === 0 && r.getInt(3) === 0)
      assert(r.getLong(4) === 40L)
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

  test("PARTITIONED export (r17): Hive k=v layout, partition values " +
      "in dir names only, DVs reconciled, plain reader round-trips") {
    val dir = tmp("graft_exp_lake5")
    mkLake(dir)
    // DV some rows so the partitioned path proves reconciliation too
    val (_, rw, _, nDel) = LakeSink.deleteWhere(spark, dir,
      col("flag") === 1L && col("id") < 20L, dvMaxFraction = 1.0)
    assert(rw === 0 && nDel > 0)
    val out = tmp("graft_exp_out5")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val tbl = "graft_exp_sql5_" + System.nanoTime()
    LakeCatalog.register(tbl, dir)
    try {
      val r = spark.sql(
        s"EXPORT TABLE $tbl TO '$out' PARTITIONED BY (flag)")
        .collect().head
      // always a rewrite: re-bucketing by value is data movement
      assert(r.getInt(1) === 0 && r.getInt(2) === 0 && r.getInt(3) === 2)
      assert(r.getLong(4) === 40L - nDel)
      // one directory per live partition value, nothing else but the
      // _SUCCESS marker at top level
      val top = Files.list(Paths.get(out)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
      val partDirs = top.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("flag="))
      assert(partDirs.map(_.getFileName.toString).toSet ===
        Set("flag=0", "flag=1", "flag=2", "flag=3"))
      // partition values live in DIRECTORY NAMES only — the data
      // files inside must NOT repeat the column (uniform layout)
      val onePart = Files.list(partDirs.head).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      assert(!spark.read.parquet(onePart.toString)
        .schema.fieldNames.contains("flag"))
      // a plain hive-aware reader reconstructs exactly readTable
      // (partition col type is INFERRED from dir names → cast back)
      val plain = spark.read.parquet(out)
        .select(col("id"), col("flag").cast("long"), col("payload"))
        .collect().map(_.toSeq).toSet
      val engine = LakeSink.readTable(spark, dir)
        .select("id", "flag", "payload").collect().map(_.toSeq).toSet
      assert(plain === engine)
      // deleted rows stayed deleted through the partitioned rewrite
      assert(!plain.exists(r0 => r0(1) == 1L &&
        r0.head.asInstanceOf[Long] < 20L))
      // unknown partition column refuses loud
      val e = intercept[Exception] {
        LakeSink.exportTable(spark, dir, tmp("graft_exp_out5b"),
          partitionBy = Some("nope"))
      }
      assert(e.getMessage.contains("no such column"))
    } finally LakeCatalog.unregister(tbl)
  }

  test("INCREMENTAL export (r17): SINCE VERSION appends only the new " +
      "segments; combined dir == tip; non-append-only windows refuse") {
    val dir = tmp("graft_exp_lake6")
    mkLake(dir) // v1 create, v2 seg_a, v3 seg_b
    val out = tmp("graft_exp_out6")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val a = LakeSink.readManifest(dir).version
    val (_, l1, _, rw1, rows1) = LakeSink.exportTable(spark, dir, out)
    assert(l1 > 0 && rw1 === 0 && rows1 === 40L)
    // append-only window: one new segment
    import spark.implicits._
    LakeSink.appendSegment(spark, dir,
      (100L until 110L).map(i => (i, i % 4, s"p$i"))
        .toDF("id", "flag", "payload"), "seg_c")
    val tbl = "graft_exp_sql6_" + System.nanoTime()
    LakeCatalog.register(tbl, dir)
    try {
      val r = spark.sql(
        s"EXPORT TABLE $tbl TO '$out' SINCE VERSION $a").collect().head
      // only seg_c moved, and it pure-linked (clean append)
      assert(r.getInt(1) > 0 && r.getInt(2) === 0 && r.getInt(3) === 0)
      assert(r.getLong(4) === 10L)
      val seen = Files.list(Paths.get(out)).toArray
        .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(_.endsWith(".parquet"))
      assert(seen.exists(_.startsWith("seg_c__")))
      // the COMBINED directory is exactly the tip
      val plain = spark.read.parquet(out).select("id", "flag", "payload")
        .collect().map(_.toSeq).toSet
      val engine = LakeSink.readTable(spark, dir)
        .select("id", "flag", "payload").collect().map(_.toSeq).toSet
      assert(plain === engine && plain.size === 50)
      // refusals — each names the violation it cannot represent:
      // (i) SINCE not below the export version
      val eq = intercept[Exception] {
        LakeSink.exportTable(spark, dir, out,
          sinceVersion = Some(LakeSink.readManifest(dir).version))
      }
      assert(eq.getMessage.contains("not below"))
      // (ii) a base segment got a DV in the window (new deletions)
      val aNow = LakeSink.readManifest(dir).version
      val (_, rwD, _, nD) = LakeSink.deleteWhere(spark, dir,
        col("id") === 3L, dvMaxFraction = 1.0)
      assert(rwD === 0 && nD === 1L)
      val eDv = intercept[Exception] {
        LakeSink.exportTable(spark, dir, out, sinceVersion = Some(aNow))
      }
      assert(eDv.getMessage.contains("deletion vector"))
      // (iii) a base segment disappeared (compaction rewrote it)
      val aNow2 = LakeSink.readManifest(dir).version
      LakeSink.compact(spark, dir)
      val eGone = intercept[Exception] {
        LakeSink.exportTable(spark, dir, out, sinceVersion = Some(aNow2))
      }
      assert(eGone.getMessage.contains("append-only"))
    } finally LakeCatalog.unregister(tbl)
  }

  test("manifest-carried segment row counts (r17): recorded at " +
      "commit, maintained by DML/clone/restore, advisory fallback") {
    val dir = tmp("graft_exp_lake7")
    mkLake(dir)
    val m0 = LakeSink.readManifest(dir)
    // recorded at segment-commit time, one entry per live segment
    assert(m0.segRows === Map("seg_a" -> 20L, "seg_b" -> 20L))
    // a CoW rewrite recounts: delete 5 rows of seg_a copy-on-write
    val (_, rwC, _, nDelC) = LakeSink.deleteWhere(spark, dir,
      col("id") < 5L, dvMaxFraction = 0.0)
    assert(rwC === 1 && nDelC === 5L)
    val m1 = LakeSink.readManifest(dir)
    assert(m1.segRows.values.sum === 35L,
      s"rewrite did not recount: ${m1.segRows}")
    assert(!m1.segRows.contains("seg_a"), "dead segment entry leaked")
    // clone and restore both CARRY the counts (no re-derivation)
    val cdir = tmp("graft_exp_lake7c")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cdir))
    LakeSink.cloneTable(spark, dir, cdir)
    assert(LakeSink.readManifest(cdir).segRows === m1.segRows)
    // advisory: a manifest with NO counts (legacy/foreign writer)
    // still exports with the footer fallback — rowsOf answers -1
    assert(m1.rowsOf("never_counted") === -1L)
  }

  test("MULTI-COLUMN partitioned export (r18): nested k=v/k=v dirs in " +
      "spec order, values in dir names only, hive reader round-trips") {
    import spark.implicits._
    val dir = tmp("graft_exp_lake_mc")
    val df = (0L until 40L).map(i => (i, i % 4, i % 2, s"p$i"))
      .toDF("id", "flag", "par", "payload")
    LakeSink.createTable(dir, df.schema)
    LakeSink.appendSegment(spark, dir, df, "seg_a")
    val out = tmp("graft_exp_out_mc")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val tbl = "graft_exp_mc_" + System.nanoTime()
    LakeCatalog.register(tbl, dir)
    try {
      val r = spark.sql(
        s"EXPORT TABLE $tbl TO '$out' PARTITIONED BY (flag, par)")
        .collect().head
      assert(r.getInt(1) === 0 && r.getInt(2) === 0 && r.getInt(3) === 1)
      assert(r.getLong(4) === 40L)
      // outer level: flag=, inner level: par= — spec order
      val top = Files.list(Paths.get(out)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => Files.isDirectory(p))
      assert(top.map(_.getFileName.toString).toSet ===
        Set("flag=0", "flag=1", "flag=2", "flag=3"))
      top.foreach { t =>
        val inner = Files.list(t).toArray
          .map(_.asInstanceOf[java.nio.file.Path])
          .filter(p => Files.isDirectory(p))
          .map(_.getFileName.toString).toSet
        // flag i pins par = i % 2 here (par = id % 2, flag = id % 4)
        val want = t.getFileName.toString.stripPrefix("flag=").toLong % 2
        assert(inner === Set(s"par=$want"), s"under ${t.getFileName}")
      }
      // neither partition column is repeated inside the files
      val leaf = Files.walk(Paths.get(out)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val inFile = spark.read.parquet(leaf.toString).schema.fieldNames
      assert(!inFile.contains("flag") && !inFile.contains("par"))
      // a plain hive-aware reader reconstructs exactly readTable
      val plain = spark.read.parquet(out)
        .select(col("id"), col("flag").cast("long"),
          col("par").cast("long"), col("payload"))
        .collect().map(_.toSeq).toSet
      val engine = LakeSink.readTable(spark, dir)
        .select("id", "flag", "par", "payload")
        .collect().map(_.toSeq).toSet
      assert(plain === engine)
    } finally LakeCatalog.unregister(tbl)
  }

  test("partitioned × incremental composition (r18): same-spec delta " +
      "appends into the k=v tree; mixed layouts and unverifiable " +
      "targets refuse loud") {
    import spark.implicits._
    val dir = tmp("graft_exp_lake_pi")
    mkLake(dir)
    val out = tmp("graft_exp_out_pi")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val a = LakeSink.readManifest(dir).version
    // partitioned full export of version a
    val (_, l0, c0, rw0, _) = LakeSink.exportTable(spark, dir, out,
      partitionBy = Some("flag"))
    assert(l0 === 0 && c0 === 0 && rw0 === 2)
    // append-only window, then a SAME-SPEC partitioned delta export
    LakeSink.appendSegment(spark, dir,
      (100L until 110L).map(i => (i, i % 4, s"p$i"))
        .toDF("id", "flag", "payload"), "seg_c")
    val (_, l1, c1, rw1, rows1) = LakeSink.exportTable(spark, dir, out,
      partitionBy = Some("flag"), sinceVersion = Some(a))
    assert(l1 === 0 && c1 === 0 && rw1 === 1 && rows1 === 10L)
    // the combined TREE is exactly the tip through a hive-aware reader
    val plain = spark.read.parquet(out)
      .select(col("id"), col("flag").cast("long"), col("payload"))
      .collect().map(_.toSeq).toSet
    val engine = LakeSink.readTable(spark, dir)
      .select("id", "flag", "payload").collect().map(_.toSeq).toSet
    assert(plain === engine && plain.size === 50)
    val aNow = LakeSink.readManifest(dir).version
    LakeSink.appendSegment(spark, dir,
      Seq((500L, 1L, "x")).toDF("id", "flag", "payload"), "seg_d")
    // FLAT delta into the partitioned tree → mixed layout, refuse
    val eMix = intercept[IllegalArgumentException] {
      LakeSink.exportTable(spark, dir, out, sinceVersion = Some(aNow))
    }
    assert(eMix.getMessage.contains("layouts cannot mix"))
    // partitioned delta onto a FLAT base refuses the same way
    val flatOut = tmp("graft_exp_out_pi_flat")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(flatOut))
    LakeSink.exportTable(spark, dir, flatOut)
    val bNow = LakeSink.readManifest(dir).version
    LakeSink.appendSegment(spark, dir,
      Seq((501L, 2L, "y")).toDF("id", "flag", "payload"), "seg_e")
    val eMix2 = intercept[IllegalArgumentException] {
      LakeSink.exportTable(spark, dir, flatOut,
        partitionBy = Some("flag"), sinceVersion = Some(bNow))
    }
    assert(eMix2.getMessage.contains("layouts cannot mix"))
    // a FRESH target has no receipt — the commonest misuse (advisor):
    // the old behavior silently produced an incomplete directory
    val fresh = tmp("graft_exp_out_pi_fresh")
    val eFresh = intercept[IllegalArgumentException] {
      LakeSink.exportTable(spark, dir, fresh, sinceVersion = Some(bNow))
    }
    assert(eFresh.getMessage.contains("no prior export"))
    // and a WRONG-VERSION base refuses with both versions named
    // (bNow − 1 keeps every append-only guard green so the MARKER
    // check is provably what fires)
    val eVer = intercept[IllegalArgumentException] {
      LakeSink.exportTable(spark, dir, flatOut,
        sinceVersion = Some(bNow - 1))
    }
    assert(eVer.getMessage.contains(s"the export of version $bNow"))
  }

  test("cross-filesystem export (r18): a target the lake's volume " +
      "cannot hard-link to degrades to copies, receipt says so") {
    assume(Files.isDirectory(Paths.get("/dev/shm")),
      "no tmpfs mount to test the cross-device path")
    val dir = tmp("graft_exp_lake_xfs") // under /tmp (ext4)
    mkLake(dir)
    val out = "/dev/shm/graft_exp_out_xfs_" + System.nanoTime()
    try {
      val (_, linked, copied, rewritten, rows) =
        LakeSink.exportTable(spark, dir, out)
      // tmpfs cannot share inodes with ext4: every clean file COPIES
      assert(linked === 0 && copied > 0 && rewritten === 0)
      assert(rows === 40L)
      val plain = spark.read.parquet(out).select("id", "flag", "payload")
        .collect().map(_.toSeq).toSet
      val engine = LakeSink.readTable(spark, dir)
        .select("id", "flag", "payload").collect().map(_.toSeq).toSet
      assert(plain === engine, "copied export diverges from readTable")
      // copies are real bytes, not links (no shared inode possible,
      // but prove the files are independently complete anyway)
      val src = Files.list(Paths.get(dir, "seg_a")).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
      src.foreach { p =>
        val cp = Paths.get(out, "seg_a__" + p.getFileName.toString)
        assert(Files.size(cp) === Files.size(p))
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(out))
  }

  test("segment row counts survive the snapshot-interval commit (r17 " +
      "review: a v%32==0 DML commit writes FULL state — dropping the " +
      "chain's counts there would silently orphan every prior segment)") {
    val dir = tmp("graft_exp_lake8")
    mkLake(dir) // v1 create, v2 seg_a, v3 seg_b
    var m = LakeSink.readManifest(dir)
    // drive the log to v31 with no-op delta commits (pure driver)
    while (m.version < 31) {
      assert(LakeSink.commitNext(dir, m, m.copy(version = m.version + 1)))
      m = LakeSink.readManifest(dir)
    }
    // v32 lands through the DML commit path and is a FULL SNAPSHOT
    val (v, rw, _, nDel) = LakeSink.deleteWhere(spark, dir,
      col("id") < 5L, dvMaxFraction = 0.0)
    assert(v === 32L && rw === 1 && nDel === 5L)
    val m32 = LakeSink.readManifest(dir)
    // the untouched segment's count crossed the snapshot; the rewrite
    // recorded its census-known count with no footer read
    assert(m32.segRows("seg_b") === 20L)
    assert(m32.segRows.values.sum === 35L, s"got ${m32.segRows}")
  }
}
