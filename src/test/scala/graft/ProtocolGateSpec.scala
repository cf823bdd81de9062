package graft

import java.nio.file.{Files, Paths}

import graft.streaming.LakeSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Protocol version gate (r15, Delta's minReaderVersion/minWriterVersion
  * analog). The failure this prevents is SILENT, not loud: a manifest
  * feature an old engine does not know is not skippable — ignoring
  * `dvec=` lines resurrects deleted rows, ignoring `colmap=` misreads
  * renamed columns, a writer that drops `copy=` lines breaks COPY INTO
  * idempotency. So manifests DECLARE the capability they require and
  * engines REFUSE (loudly) above their ceiling, instead of returning
  * wrong answers.
  */
class ProtocolGateSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def mkLake(dir: String): Unit = {
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, i % 4)).toDF("id", "flag")
    LakeSink.createTable(dir, df.schema)
    LakeSink.appendSegment(spark, dir, df, "seg_a")
  }

  private def manifestText(dir: String, v: Long): String =
    new String(Files.readAllBytes(
      Paths.get(dir, "_manifest", f"v$v%010d.txt")), "UTF-8")

  test("baseline lakes carry no gate headers; features bump them") {
    val dir = tmp("graft_gate_base")
    mkLake(dir)
    val m0 = LakeSink.readManifest(dir)
    assert(m0.minReader === 1L && m0.minWriter === 1L)
    assert(!manifestText(dir, m0.version).contains("minreader="))

    // a deletion vector is unreadable-if-ignored → reader 2, writer 2
    LakeSink.deleteWhere(spark, dir, col("flag") === 1L,
      dvMaxFraction = 1.0)
    val m1 = LakeSink.readManifest(dir)
    assert(m1.dv.nonEmpty, "test shape broke: delete took no DV")
    assert(m1.minReader === 2L && m1.minWriter === 2L)
    assert(manifestText(dir, m1.version).contains("minreader=2"))

    // the COPY INTO ledger is uncarryable-if-ignored → writer 3
    import spark.implicits._
    val drop = tmp("graft_gate_drop")
    (100L until 110L).map(i => (i, i % 4)).toDF("id", "flag")
      .coalesce(1).write.mode("overwrite").parquet(drop)
    LakeSink.copyInto(spark, drop, dir)
    val m2 = LakeSink.readManifest(dir)
    assert(m2.minReader === 2L && m2.minWriter === 3L)

    // never-downgrade along the delta chain: purging the DV debt does
    // not re-admit old readers mid-log
    LakeSink.purgeDv(spark, dir)
    val m3 = LakeSink.readManifest(dir)
    assert(m3.dv.isEmpty && m3.minReader === 2L)
  }

  test("a manifest from the future refuses the READER loudly") {
    val dir = tmp("graft_gate_reader")
    mkLake(dir)
    // handcraft v2: a valid snapshot whose features claim reader 99
    Files.write(Paths.get(dir, "_manifest", "v0000000002.txt"),
      "maxb=1\nminreader=99\nseg_a".getBytes("UTF-8"))
    val e = intercept[RuntimeException] {
      LakeSink.readManifest(dir)
    }
    assert(e.getMessage.contains("requires reader version 99"))
    assert(e.getMessage.contains("upgrade the engine"))
  }

  test("a table from the future refuses the WRITER loudly but stays readable") {
    val dir = tmp("graft_gate_writer")
    mkLake(dir)
    Files.write(Paths.get(dir, "_manifest", "v0000000002.txt"),
      "maxb=1\nminwriter=99\nseg_a".getBytes("UTF-8"))
    // reading is within this engine's ceiling — must still work
    assert(LakeSink.readTable(spark, dir).count() === 20L)
    assert(LakeSink.readManifest(dir).minWriter === 99L)
    // any commit path must refuse before touching the log
    import spark.implicits._
    val e = intercept[RuntimeException] {
      LakeSink.appendSegment(spark, dir,
        Seq((99L, 0L)).toDF("id", "flag"), "seg_new")
    }
    assert(e.getMessage.contains("requires writer version 99"))
    val e2 = intercept[RuntimeException] {
      LakeSink.deleteWhere(spark, dir, col("flag") === 0L)
    }
    assert(e2.getMessage.contains("requires writer version 99"))
    // nothing committed
    assert(LakeSink.readManifest(dir).version === 2L)
  }

  test("clone and restore carry the gate with the state they publish") {
    val dir = tmp("graft_gate_clone_src")
    mkLake(dir) // v1 create, v2 append
    LakeSink.deleteWhere(spark, dir, col("flag") === 1L,
      dvMaxFraction = 1.0) // v3: DVs
    val cl = tmp("graft_gate_clone_dst")
    LakeSink.cloneTable(spark, dir, cl)
    assert(LakeSink.readManifest(cl).minReader === 2L,
      "clone dropped the reader gate with the DVs it carries")
    // restore to the PRE-DV state: the gate soundly relaxes with it
    // (nothing left to misread at the tip) — while time travel to the
    // DV'd v3 stays gated by v3's own declared minimum
    LakeSink.restoreTable(spark, dir, 2L)
    assert(LakeSink.readManifest(dir).minReader === 1L)
    assert(LakeSink.manifestAt(dir, 3L).minReader === 2L)
    // re-publish the DV'd state: the gate returns with it
    LakeSink.restoreTable(spark, dir, 3L)
    assert(LakeSink.readManifest(dir).minReader === 2L)
  }
}
