package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Partition-spec retention probe (r12): the design claim is that
  * `DELETE WHERE day < cutoff` on a PARTITIONED lake is metadata-only
  * — ZERO Spark jobs, zero data bytes written, cost independent of
  * table size — while the same statement on an UNALIGNED layout (id-
  * bucketed segments, every segment straddling the cutoff) must scan
  * and rewrite every segment. The probe runs the same retention delete
  * against both layouts built from the same N×-replicated events rows:
  *
  *   part = createTable(partitionBy = day) + appendPartitioned →
  *          30 day-segments with manifest partition facts;
  *   cow  = 32 event_id-bucket segments, no partition facts →
  *          every segment partially matches, full rewrite.
  *
  * Reported: wall seconds, SPARK JOB COUNT (the zero-jobs claim is a
  * counted number), and bytes the delete added to each lake. Both
  * sides are invariant-checked to leave identical row counts.
  */
object PartitionDropProbe {

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
      col("event_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val span = base.agg(max("event_id")).head().getLong(0) + 1L
    val ev = (0 until replicas).map(r => base
        .withColumn("event_id", col("event_id") + lit(r * span)))
      .reduce(_ unionByName _)
      .persist()
    val nRows = ev.count()

    // partitioned twin: one write job for all 30 day-segments
    val dirPart = java.nio.file.Files
      .createTempDirectory("graft_pdrop_part").toString
    LakeSink.createTable(dirPart, ev.schema, partitionBy = Some("day"))
    val (_, nParts) = LakeSink.appendPartitioned(spark, dirPart, ev)

    // unaligned twin: id-bucketed segments — the layout a writer that
    // never declared a partition column produces
    val dirCow = java.nio.file.Files
      .createTempDirectory("graft_pdrop_cow").toString
    (0 until 32).foreach { i =>
      val seg = s"seg_b$i"
      ev.filter(col("event_id") % 32 === i)
        .write.mode("overwrite").parquet(s"$dirCow/$seg")
      val m = LakeSink.readManifest(dirCow)
      require(LakeSink.commitManifest(dirCow, m.version + 1, i.toLong,
        m.segs :+ seg), s"probe ingest commit $i lost a race")
    }
    ev.unpersist()

    val cutoff = base.agg(min("day")).head().getLong(0) + 10L

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def jobsIn[T](body: => T): (T, Int) = {
      val sc = spark.sparkContext
      val group = "graft-pdrop-" + java.util.UUID.randomUUID().toString
      sc.setJobGroup(group, group)
      val r = try body finally sc.clearJobGroup()
      var last = -1
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      var polls = 0
      while (cur != last && polls < 50) {
        last = cur; Thread.sleep(100)
        cur = sc.statusTracker.getJobIdsForGroup(group).length
        polls += 1
      }
      (r, cur)
    }
    def dirBytes(p: String): Long =
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(p))

    val basePart = dirBytes(dirPart)
    val baseCow = dirBytes(dirCow)

    val (((_, rwPart, dropPart, nDelPart), jobsPart), tPart) =
      time(jobsIn(LakeSink.deleteWhere(spark, dirPart,
        col("day") < cutoff)))
    val ((_, rwCow, dropCow, nDelCow), tCow) =
      time(LakeSink.deleteWhere(spark, dirCow, col("day") < cutoff))
    require(rwPart == 0 && jobsPart == 0,
      s"partitioned retention must be metadata-only " +
        s"(rewrote $rwPart, $jobsPart jobs)")
    require(nDelPart == nDelCow,
      s"twins disagree: part deleted $nDelPart, cow deleted $nDelCow")

    val partWritten = dirBytes(dirPart) - basePart
    val cowWritten = dirBytes(dirCow) - baseCow

    val left = LakeSink.readTable(spark, dirPart).count()
    require(left == LakeSink.readTable(spark, dirCow).count() &&
      left == nRows - nDelPart,
      "twins disagree on surviving rows")

    println(f"""{"probe":"partition_retention_delete","sf":"$sfDir",""" +
      f""""replicas":$replicas,"n_rows":$nRows,"n_parts":$nParts,""" +
      f""""n_deleted":$nDelPart,"part_dropped_segs":$dropPart,""" +
      f""""cow_rewritten_segs":$rwCow,"cow_dropped_segs":$dropCow,""" +
      f""""part_delete_sec":$tPart%.3f,"part_delete_jobs":$jobsPart,""" +
      f""""cow_delete_sec":$tCow%.3f,""" +
      f""""part_written_bytes":$partWritten,""" +
      f""""cow_written_bytes":$cowWritten}""")

    // ---- COMPOSITE twin (r15): (day × event_type) fact tuples ------
    // The r14 verdict's gap: on a day-only layout the second dimension
    // of `DELETE WHERE day < cutoff AND event_type = 'click'` cannot
    // be decided by metadata — covered day-segments must SCAN (and
    // rewrite the click rows out). With composite facts the same
    // statement is zero-jobs, and so is the single-dimension
    // `DELETE WHERE event_type = 'view'`.
    val baseT = Tables.events(spark, sfDir).select(
      col("event_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val evT = (0 until replicas).map(r => baseT
        .withColumn("event_id", col("event_id") + lit(r * span)))
      .reduce(_ unionByName _)
      .persist()
    evT.count()
    val dirMulti = java.nio.file.Files
      .createTempDirectory("graft_pdrop_multi").toString
    LakeSink.createTable(dirMulti, evT.schema,
      partitionBy = Some("day,event_type"))
    val (_, nTuples) = LakeSink.appendPartitioned(spark, dirMulti, evT)
    val dirDay = java.nio.file.Files
      .createTempDirectory("graft_pdrop_day").toString
    LakeSink.createTable(dirDay, evT.schema, partitionBy = Some("day"))
    LakeSink.appendPartitioned(spark, dirDay, evT)
    evT.unpersist()

    val compositePred =
      col("day") < cutoff && col("event_type") === "click"
    val baseMulti = dirBytes(dirMulti)
    val baseDay = dirBytes(dirDay)
    val (((_, rwM, dropM, nDelM), jobsM), tM) =
      time(jobsIn(LakeSink.deleteWhere(spark, dirMulti, compositePred)))
    val (((_, rwD, dropD, nDelD), jobsD), tD) =
      time(jobsIn(LakeSink.deleteWhere(spark, dirDay, compositePred)))
    require(rwM == 0 && jobsM == 0,
      s"composite-covered retention must be metadata-only " +
        s"(rewrote $rwM, $jobsM jobs)")
    require(nDelM == nDelD,
      s"twins disagree: multi deleted $nDelM, day-only deleted $nDelD")
    val (((_, rwM2, dropM2, nDelM2), jobsM2), tM2) =
      time(jobsIn(LakeSink.deleteWhere(spark, dirMulti,
        col("event_type") === "view")))
    require(rwM2 == 0 && jobsM2 == 0,
      s"single-dimension delete on composite facts must be " +
        s"metadata-only (rewrote $rwM2, $jobsM2 jobs)")
    val multiWritten = dirBytes(dirMulti) - baseMulti
    val dayWritten = dirBytes(dirDay) - baseDay

    println(f"""{"probe":"partition_retention_multi","sf":"$sfDir",""" +
      f""""replicas":$replicas,"n_tuples":$nTuples,""" +
      f""""composite_deleted":$nDelM,"multi_dropped_segs":$dropM,""" +
      f""""multi_jobs":$jobsM,"multi_sec":$tM%.3f,""" +
      f""""multi_written_bytes":$multiWritten,""" +
      f""""dayonly_rewritten_segs":$rwD,"dayonly_dropped_segs":$dropD,""" +
      f""""dayonly_jobs":$jobsD,"dayonly_sec":$tD%.3f,""" +
      f""""dayonly_written_bytes":$dayWritten,""" +
      f""""dim2_deleted":$nDelM2,"dim2_dropped_segs":$dropM2,""" +
      f""""dim2_jobs":$jobsM2,"dim2_sec":$tM2%.3f}""")
  }
}
