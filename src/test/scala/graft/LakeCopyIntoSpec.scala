package graft

import graft.streaming.{LakeCatalog, LakeSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COPY INTO ([[LakeSink.copyInto]], r15) — idempotent landing-zone
  * ingestion against the manifest's cumulative load-history ledger.
  * The contract: each landing file loads EXACTLY ONCE across any
  * number of re-runs; a run that finds nothing new commits nothing;
  * the ledger outlives segment deletion (retention DML must not make
  * a re-run resurrect erased rows), layout changes (OPTIMIZE), clones
  * and RESTORE; `REPLACE TABLE AS` resets it with the rest of the
  * table definition.
  */
class LakeCopyIntoSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** One landing drop: rows [lo, hi) as `n` parquet files. */
  private def drop(dir: String, lo: Long, hi: Long, n: Int): Unit = {
    import spark.implicits._
    (lo until hi).map(i => (i, s"v$i")).toDF("id", "payload")
      .repartition(n).write.mode("overwrite").parquet(dir)
  }

  private def ids(dir: String): Seq[Long] =
    LakeSink.readTable(spark, dir).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("initial load, idempotent re-run (commits nothing), delta drop") {
    val lake = tmp("graft_cp_lake")
    val drop1 = tmp("graft_cp_drop1")
    drop(drop1, 0L, 40L, 4)

    val (v1, l1, s1, r1) = LakeSink.copyInto(spark, drop1, lake)
    assert(l1 === 4 && s1 === 0 && r1 === 40L)
    assert(ids(lake) === (0L until 40L))

    // re-run: all files skip, NO new version (a no-op run that
    // committed would churn the log on every orchestrator tick)
    val (v2, l2, s2, r2) = LakeSink.copyInto(spark, drop1, lake)
    assert(l2 === 0 && s2 === 4 && r2 === 0L)
    assert(v2 === v1, "skip-everything run committed a version")
    assert(ids(lake) === (0L until 40L))

    // second drop under a new prefix: only its files load, one commit
    val drop2 = tmp("graft_cp_drop2")
    drop(drop2, 40L, 60L, 2)
    val (v3, l3, s3, r3) = LakeSink.copyInto(spark, drop2, lake)
    assert(l3 === 2 && s3 === 0 && r3 === 20L)
    assert(v3 === v1 + 1)
    assert(ids(lake) === (0L until 60L))

    // and the union re-run (both prefixes already loaded) skips all
    val (_, l4, s4, _) = LakeSink.copyInto(spark, drop1, lake)
    assert(l4 === 0 && s4 === 4)

    // DESCRIBE DETAIL surfaces the ledger size (the at-a-glance check
    // that a re-run pipeline is actually deduplicating)
    assert(LakeSink.tableDetail(spark, lake)
      .select("num_copied_files").head().getLong(0) === 6L)
  }

  test("ledger outlives segment deletion: retention DML is not undone by a re-run") {
    val lake = tmp("graft_cp_del_lake")
    val d1 = tmp("graft_cp_del_drop")
    drop(d1, 0L, 20L, 2)
    LakeSink.copyInto(spark, d1, lake)
    // erase half the rows (drops/rewrites loaded segments)
    LakeSink.deleteWhere(spark, lake, col("id") < 10L)
    assert(ids(lake) === (10L until 20L))
    val (_, loaded, skipped, _) = LakeSink.copyInto(spark, d1, lake)
    assert(loaded === 0 && skipped === 2,
      "re-run after DELETE resurrected erased rows")
    assert(ids(lake) === (10L until 20L))
  }

  test("ledger survives OPTIMIZE, SHALLOW CLONE, and RESTORE") {
    val lake = tmp("graft_cp_opt_lake")
    val d1 = tmp("graft_cp_opt_drop")
    drop(d1, 0L, 20L, 2)
    LakeSink.copyInto(spark, d1, lake)

    LakeSink.compact(spark, lake)
    val (_, lo, so, _) = LakeSink.copyInto(spark, d1, lake)
    assert(lo === 0 && so === 2, "OPTIMIZE dropped the load ledger")

    val cl = tmp("graft_cp_clone")
    LakeSink.cloneTable(spark, lake, cl)
    val (_, lc, sc, _) = LakeSink.copyInto(spark, d1, cl)
    assert(lc === 0 && sc === 2, "clone dropped the load ledger")

    // RESTORE to v1 (pre-compaction): the tip ledger survives — undo
    // of data must not forget what was ingested
    LakeSink.restoreTable(spark, lake, 1L)
    val (_, lr, sr, _) = LakeSink.copyInto(spark, d1, lake)
    assert(lr === 0 && sr === 2, "RESTORE dropped the load ledger")
  }

  test("REPLACE TABLE AS keeps the ledger — idempotence survives redefinition") {
    import spark.implicits._
    val lake = tmp("graft_cp_rtas_lake")
    val d1 = tmp("graft_cp_rtas_drop")
    drop(d1, 0L, 10L, 1)
    LakeSink.copyInto(spark, d1, lake)
    LakeSink.replaceTableAs(spark, lake,
      Seq((100L, "x")).toDF("id", "payload"))
    // like the txn guards RTAS carries: a re-run loader stays a no-op
    // on the replaced table (the old rows were deliberately dropped)
    val (_, loaded, skipped, _) = LakeSink.copyInto(spark, d1, lake)
    assert(loaded === 0 && skipped === 1,
      "re-run after REPLACE re-ingested a consumed landing file")
    assert(ids(lake) === Seq(100L))
  }

  test("schema mismatch refuses loud; file rewritten in place is skipped by design") {
    import spark.implicits._
    val lake = tmp("graft_cp_schema_lake")
    val d1 = tmp("graft_cp_schema_drop")
    drop(d1, 0L, 10L, 1)
    LakeSink.copyInto(spark, d1, lake)

    val bad = tmp("graft_cp_schema_bad")
    Seq((1L, 2L)).toDF("id", "other").write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException] {
      LakeSink.copyInto(spark, bad, lake)
    }
    assert(e.getMessage.contains("does not match"))

    // rewrite the same file NAME in place with different rows: the
    // path-keyed ledger skips it (immutable-drop convention —
    // corrections land under NEW names)
    val other = tmp("graft_cp_schema_other")
    drop(other, 50L, 60L, 1)
    def partFile(d: String): java.nio.file.Path =
      new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
    java.nio.file.Files.copy(partFile(other), partFile(d1),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop Hadoop's local-FS checksum sidecars — stale .crc files
    // describe the pre-rewrite bytes and would fail the read for a
    // reason unrelated to what this test pins
    new java.io.File(d1).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val (_, loaded, skipped, _) = LakeSink.copyInto(spark, d1, lake)
    assert(loaded === 0 && skipped === 1)
    assert(ids(lake) === (0L until 10L))
  }

  test("CAS loss to a concurrent copier over the SAME prefix never deletes committed data") {
    // The advertised failure (r16): a hung loader stages its segments,
    // an orchestrator retry loads the same landing prefix and COMMITS,
    // then the hung loader wakes, loses the CAS, and cleans up. Its
    // staged `seg_cp_<id>` dirs are — by deterministic naming — the
    // very directories the winner's manifest now references; deleting
    // them would permanently break the table (the ids are in the
    // ledger, so no retry ever re-stages them).
    val lake = tmp("graft_cp_race_lake")
    val prefix = tmp("graft_cp_race_drop")
    drop(prefix, 0L, 30L, 3)
    var winnerV = 0L
    val (v, loaded, skipped, rows) = LakeSink.copyInto(spark, prefix, lake,
      beforeCommit = () => {
        // the "orchestrator retry": a full COPY INTO of the same
        // prefix commits while the outer (hung) loader sits between
        // staging and its manifest CAS
        val (wv, wl, _, wr) = LakeSink.copyInto(spark, prefix, lake)
        winnerV = wv
        assert(wl === 3 && wr === 30L)
      })
    // the loser retried, found everything in the ledger, and skipped
    assert(loaded === 0 && skipped === 3 && rows === 0L)
    assert(v === winnerV, "loser re-loaded files the winner committed")
    // the table is intact: every committed segment dir still exists
    // and every row reads back (the old cleanup deleted the winner's
    // live segments here)
    val m = LakeSink.readManifest(lake)
    m.segs.foreach { s =>
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(lake, s)), s"live segment $s deleted")
    }
    assert(ids(lake) === (0L until 30L))
    assert(m.copied.size === 3)
  }

  test("SQL COPY INTO: receipt + idempotent re-run through the statement") {
    val lake = tmp("graft_cp_sql_lake")
    val d1 = tmp("graft_cp_sql_drop")
    drop(d1, 0L, 30L, 3)
    val tbl = "graft_cp_" + java.lang.Long.toHexString(System.nanoTime())
    LakeCatalog.register(tbl, lake)
    try {
      val r1 = spark.sql(s"COPY INTO $tbl FROM '$d1'").collect().head
      assert(r1.getInt(1) === 3 && r1.getInt(2) === 0 &&
        r1.getLong(3) === 30L)
      val r2 = spark.sql(
        s"COPY INTO $tbl FROM '$d1' FILEFORMAT = PARQUET").collect().head
      assert(r2.getInt(1) === 0 && r2.getInt(2) === 3 &&
        r2.getLong(3) === 0L)
      assert(r2.getLong(0) === r1.getLong(0))
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) === 30L)
    } finally LakeCatalog.unregister(tbl)
  }
}
