package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion-vector write-amplification probe (r12): the merge-on-read
  * design claim is that a POINT delete costs O(deleted rows) to
  * write, while copy-on-write pays a full rewrite of every touched
  * segment. This probe runs the SAME 4-row delete (4 rows, 4
  * different segments) against two byte-identical N×-replicated
  * events lakes (32 segments):
  *
  *   cow = deleteWhere(dvMaxFraction = 0)  — rewrites 4 segments;
  *   dv  = deleteWhere(dvMaxFraction = 1)  — writes 4 positional DV
  *         files, segments untouched.
  *
  * Both variants pay the same planning scans (per-segment match
  * counts); the measured difference is pure write amplification —
  * which GROWS linearly with segment size for copy-on-write and is
  * FLAT for DVs. The post-delete full-table read is timed for both to
  * price the reconcile anti-join (the merge-on-read "read tax"), and
  * written bytes are reported so the O(deleted rows) claim is a
  * number, not an adjective.
  */
object DvProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val span = base.agg(max("event_id")).head().getLong(0) + 1L
    val ev = (0 until replicas).map(r => base
        .withColumn("event_id", col("event_id") + lit(r * span)))
      .reduce(_ unionByName _)
      .persist()
    val nRows = ev.count()

    val dirCow = java.nio.file.Files
      .createTempDirectory("graft_dv_probe_cow").toString
    (0 until 32).foreach { i =>
      val seg = s"seg_b$i"
      ev.filter(col("event_id") % 32 === i)
        .write.mode("overwrite").parquet(s"$dirCow/$seg")
      val m = LakeSink.readManifest(dirCow)
      require(LakeSink.commitManifest(dirCow, m.version + 1, i.toLong,
        m.segs :+ seg), s"probe ingest commit $i lost a race")
    }
    ev.unpersist()
    // byte-identical twin for the DV variant
    val dirDv = java.nio.file.Files
      .createTempDirectory("graft_dv_probe_dv").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dirCow), new java.io.File(dirDv))

    // 4 rows in 4 different segments — the GDPR-erasure shape
    val pred = col("event_id").isin(17L, 18L, 19L, 20L)

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isDirectory) org.apache.commons.io.FileUtils.sizeOfDirectory(f)
      else 0L
    }
    val baseBytes = dirBytes(dirCow)

    val ((_, _, _, nCow), tCow) =
      time(LakeSink.deleteWhere(spark, dirCow, pred))
    val ((_, rwDv, _, nDv), tDv) =
      time(LakeSink.deleteWhere(spark, dirDv, pred, dvMaxFraction = 1.0))
    require(nCow == 4L && nDv == 4L && rwDv == 0,
      s"probe invariant: cow=$nCow dv=$nDv rewrites=$rwDv")

    // write amplification: bytes the delete ADDED to each lake
    // (rewritten segments vs DV files; manifest records excluded by
    // measuring the whole dir — they are bytes too, honestly counted)
    val cowWritten = dirBytes(dirCow) - baseBytes
    val dvWritten = dirBytes(dirDv) - baseBytes

    // read tax: full-table count, warmed, min-of-3
    def cowCount(): Long = LakeSink.readTable(spark, dirCow).count()
    def dvCount(): Long = LakeSink.readTable(spark, dirDv).count()
    cowCount(); dvCount()
    val (cCow, tReadCow) = (1 to 3).map(_ => time(cowCount())).minBy(_._2)
    val (cDv, tReadDv) = (1 to 3).map(_ => time(dvCount())).minBy(_._2)
    require(cCow == cDv && cCow == nRows - 4L,
      s"probe invariant: cow rows=$cCow dv rows=$cDv expected ${nRows - 4}")

    println(f"""{"probe":"dv_point_delete","sf":"$sfDir","replicas":$replicas,""" +
      f""""n_rows":$nRows,"n_deleted":4,""" +
      f""""cow_delete_sec":$tCow%.3f,"dv_delete_sec":$tDv%.3f,""" +
      f""""cow_written_bytes":$cowWritten,"dv_written_bytes":$dvWritten,""" +
      f""""write_ratio":${cowWritten.toDouble / math.max(1L, dvWritten)}%.1f,""" +
      f""""cow_read_sec":$tReadCow%.3f,"dv_read_sec":$tReadDv%.3f}""")

    // ---- UPDATE twin (r14): the SAME 4-row point DML as an UPDATE —
    // the GDPR-rectification shape. cow rewrites 4 segments; dv
    // writes 4 positional DV files + 4 four-row post-image appends.
    // Fresh byte-identical twins from the already-deleted cow lake's
    // ORIGINAL bytes are gone, so rebuild from dirDv's untouched
    // segments (its delete only added DV files, segments unchanged —
    // copy, then strip the DVs by resetting to the pre-delete
    // manifest is more machinery than re-copying; instead copy dirDv
    // and run the update against a predicate disjoint from the
    // deleted rows, so the pre-existing 4-row DV is irrelevant to
    // the write-bytes delta being measured).
    val dirCowU = java.nio.file.Files
      .createTempDirectory("graft_dv_probe_cow_u").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirCowU))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dirDv), new java.io.File(dirCowU))
    val dirDvU = java.nio.file.Files
      .createTempDirectory("graft_dv_probe_dv_u").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirDvU))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dirDv), new java.io.File(dirDvU))
    val updPred = col("event_id").isin(33L, 34L, 35L, 36L)
    val upd = Map("vc" -> (col("vc") + 100L))
    val baseBytesU = dirBytes(dirCowU)
    val ((_, rwCowU, nCowU), tCowU) =
      time(LakeSink.updateWhere(spark, dirCowU, updPred, upd))
    val ((_, rwDvU, nDvU), tDvU) = time(LakeSink.updateWhere(
      spark, dirDvU, updPred, upd, dvMaxFraction = 1.0))
    require(nCowU == 4L && nDvU == 4L && rwCowU == 4 && rwDvU == 0,
      s"probe invariant: cowUpd=$nCowU/$rwCowU dvUpd=$nDvU/$rwDvU")
    val cowWrittenU = dirBytes(dirCowU) - baseBytesU
    val dvWrittenU = dirBytes(dirDvU) - baseBytesU
    def cowCountU(): Long = LakeSink.readTable(spark, dirCowU).count()
    def dvCountU(): Long = LakeSink.readTable(spark, dirDvU).count()
    cowCountU(); dvCountU()
    val (cCowU, tReadCowU) = (1 to 3).map(_ => time(cowCountU())).minBy(_._2)
    val (cDvU, tReadDvU) = (1 to 3).map(_ => time(dvCountU())).minBy(_._2)
    require(cCowU == cDvU && cCowU == nRows - 4L,
      s"probe invariant: cowU rows=$cCowU dvU rows=$cDvU")

    println(f"""{"probe":"dv_point_update","sf":"$sfDir","replicas":$replicas,""" +
      f""""n_rows":$nRows,"n_updated":4,""" +
      f""""cow_update_sec":$tCowU%.3f,"dv_update_sec":$tDvU%.3f,""" +
      f""""cow_written_bytes":$cowWrittenU,"dv_written_bytes":$dvWrittenU,""" +
      f""""write_ratio":${cowWrittenU.toDouble / math.max(1L, dvWrittenU)}%.1f,""" +
      f""""cow_read_sec":$tReadCowU%.3f,"dv_read_sec":$tReadDvU%.3f}""")

    // ---- PURGE vs full OPTIMIZE (r14): paying off the DV debt.
    // dirDvU now carries 8 DV'd segments of 32 (4 delete-DVs + 4
    // update-DVs). REORG…APPLY (PURGE) rewrites exactly those 8;
    // full OPTIMIZE rewrites the whole table. Same result (debt
    // gone, rows identical) — the measured difference is O(debt)
    // vs O(table) maintenance, which is the purge's design claim.
    val dirOpt = java.nio.file.Files
      .createTempDirectory("graft_dv_probe_opt").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirOpt))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dirDvU), new java.io.File(dirOpt))
    val nDvSegs = LakeSink.readManifest(dirDvU).dv.size
    val basePurge = dirBytes(dirDvU)
    val baseOpt = dirBytes(dirOpt)
    val ((_, nPurged), tPurge) = time(LakeSink.purgeDv(spark, dirDvU))
    val ((_, nOptIn), tOpt) =
      time(LakeSink.compact(spark, dirOpt, targetFiles = 32))
    require(nPurged == nDvSegs,
      s"probe invariant: purged=$nPurged dvSegs=$nDvSegs")
    val purgeWritten = dirBytes(dirDvU) - basePurge
    val optWritten = dirBytes(dirOpt) - baseOpt
    val cPurge = LakeSink.readTable(spark, dirDvU).count()
    val cOpt = LakeSink.readTable(spark, dirOpt).count()
    require(cPurge == cOpt && cPurge == nRows - 4L,
      s"probe invariant: purge rows=$cPurge optimize rows=$cOpt")
    require(LakeSink.readManifest(dirDvU).dv.isEmpty &&
      LakeSink.readManifest(dirOpt).dv.isEmpty, "debt not fully paid")

    println(f"""{"probe":"dv_purge_vs_optimize","sf":"$sfDir","replicas":$replicas,""" +
      f""""n_rows":${nRows - 4},"n_dv_segments":$nDvSegs,"n_segments":32,""" +
      f""""purge_sec":$tPurge%.3f,"optimize_sec":$tOpt%.3f,""" +
      f""""purge_written_bytes":$purgeWritten,"optimize_written_bytes":$optWritten,""" +
      f""""write_ratio":${optWritten.toDouble / math.max(1L, purgeWritten)}%.1f,""" +
      f""""optimize_inputs":$nOptIn}""")
  }
}
