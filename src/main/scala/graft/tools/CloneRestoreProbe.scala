package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recovery/branching cost probe (r12): RESTORE and SHALLOW CLONE
  * claim to be METADATA verbs — their cost must not scale with the
  * data they logically move. Two lakes (32 segments each) at 4×
  * different data volumes; on each:
  *
  *  - a destructive DELETE rewrites most segments (the bad-backfill
  *    shape), timed;
  *  - RESTORE to the pre-delete version, timed + the restore commit's
  *    manifest bytes — the claim is FLAT wall and O(segments)
  *    metadata bytes while the DELETE it undoes scales with data;
  *  - SHALLOW CLONE of the restored lake vs a DEEP COPY of the same
  *    directory, timed + bytes written — the claim is O(files)
  *    metadata ops and ~0 new bytes vs the copy's full data volume;
  *  - equality asserted: clone reads bit-equal aggregates to source.
  */
object CloneRestoreProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: String): Long =
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(p))

    val base = Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val span = base.agg(max("event_id")).head().getLong(0) + 1L

    Seq(2, 8).foreach { replicas =>
      val ev = (0 until replicas).map(r => base
          .withColumn("event_id", col("event_id") + lit(r * span)))
        .reduce(_ unionByName _)
        .persist()
      ev.count()
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_cr_probe_$replicas").toString
      (0 until 32).foreach { i =>
        val seg = s"seg_b$i"
        ev.filter(col("event_id") % 32 === i)
          .write.mode("overwrite").parquet(s"$dir/$seg")
        val m = LakeSink.readManifest(dir)
        require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
          m.segs :+ seg), s"probe ingest commit $i lost a race")
      }
      ev.unpersist()
      val tableBytes = dirBytes(dir)
      val preV = LakeSink.readManifest(dir).version

      // the bad backfill: a delete touching every segment
      val (_, tDelete) = time(
        LakeSink.deleteWhere(spark, dir, col("event_type") === "view"))

      // RESTORE: one metadata commit undoes it all
      val ((vR, _, _), tRestore) = time(
        LakeSink.restoreTable(spark, dir, preV))
      val manifestBytes = java.nio.file.Files.size(java.nio.file.Paths
        .get(dir, "_manifest", f"v$vR%010d.txt"))

      // SHALLOW CLONE vs deep copy of the same table
      val cloneDir = java.nio.file.Files
        .createTempDirectory(s"graft_cr_clone_$replicas").toString + "/c"
      val ((_, filesLinked, bytesShared), tClone) = time(
        LakeSink.cloneTable(spark, dir, cloneDir))
      val copyDir = java.nio.file.Files
        .createTempDirectory(s"graft_cr_copy_$replicas").toString + "/c"
      val (_, tCopy) = time(
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(dir), new java.io.File(copyDir)))
      val cloneNewBytes = {
        // bytes the clone ADDED: its manifest (the links share inodes)
        dirBytes(s"$cloneDir/_manifest")
      }

      // equality: the clone reads bit-equal aggregates to the source
      def agg(d: String): (Long, Long) = {
        val r = LakeSink.readTable(spark, d)
          .agg(count(lit(1)), sum("vc")).head()
        (r.getLong(0), r.getLong(1))
      }
      require(agg(cloneDir) == agg(dir),
        "clone aggregate differs from source")

      println(f"[probe] f=$replicas table_mb=${tableBytes / 1e6}%.1f " +
        f"delete_s=$tDelete%.2f restore_s=$tRestore%.2f " +
        f"restore_manifest_b=$manifestBytes " +
        f"clone_s=$tClone%.2f files_linked=$filesLinked " +
        f"shared_mb=${bytesShared / 1e6}%.1f " +
        f"clone_new_b=$cloneNewBytes deep_copy_s=$tCopy%.2f")
    }
    spark.stop()
  }
}
