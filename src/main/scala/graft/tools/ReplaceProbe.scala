package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** INSERT OVERWRITE / replaceWhere cost probe (r12): the design claim
  * is that a partition backfill on a PARTITIONED lake costs ONE commit
  * whose delete side is metadata (zero delete-side scans, bytes =
  * the replacement rows only, independent of table size) — while the
  * same statement on an UNALIGNED layout (id-bucketed segments, every
  * segment holding some of the replaced day) must scan and rewrite
  * every straddling segment, with cost growing with the table. Both
  * twins are built from the same N×-replicated events rows and run
  * the SAME `replaceWhere(day = target, newRows)`:
  *
  *   part = createTable(partitionBy = day) + appendPartitioned →
  *          day-segments with manifest partition facts; the replaced
  *          day drops by metadata, the new day stages per-value;
  *   cow  = 32 event_id-bucket segments → every segment partially
  *          matches, full copy-on-write rewrite + one insert segment.
  *
  * Reported: wall seconds, SPARK JOB COUNT on the partitioned side
  * (the claim is a counted number: constraint check + staging only),
  * bytes each lake grew, and the version delta (atomicity: exactly
  * ONE commit on both sides). Both sides invariant-checked to hold
  * identical rows after the backfill.
  */
object ReplaceProbe {

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
      .select(col("day"), col("event_id"), col("vc"))
      .persist()
    val nRows = ev.count()

    val dirPart = java.nio.file.Files
      .createTempDirectory("graft_rpl_part").toString
    LakeSink.createTable(dirPart, ev.schema, partitionBy = Some("day"))
    LakeSink.appendPartitioned(spark, dirPart, ev)

    val dirCow = java.nio.file.Files
      .createTempDirectory("graft_rpl_cow").toString
    (0 until 32).foreach { i =>
      val seg = s"seg_b$i"
      ev.filter(col("event_id") % 32 === i)
        .write.mode("overwrite").parquet(s"$dirCow/$seg")
      val m = LakeSink.readManifest(dirCow)
      require(LakeSink.commitManifest(dirCow, m.version + 1, i.toLong,
        m.segs :+ seg), s"probe ingest commit $i lost a race")
    }

    // the backfill: day minDay+5 recomputed (vc doubled), FIXED size —
    // one base-replica's day, so the incoming batch does not grow with
    // the table
    val target = base.agg(min("day")).head().getLong(0) + 5L
    val fresh = base.filter(col("day") === target)
      .select(col("day"), col("event_id"), (col("vc") * 2L).as("vc"))
      .persist()
    val nFresh = fresh.count()
    ev.unpersist()

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def jobsIn[T](body: => T): (T, Int) = {
      val sc = spark.sparkContext
      val group = "graft-rpl-" + java.util.UUID.randomUUID().toString
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
    val vPart0 = LakeSink.readManifest(dirPart).version
    val vCow0 = LakeSink.readManifest(dirCow).version

    val (((vPart, rwPart, dropPart, delPart, insPart), jobsPart), tPart) =
      time(jobsIn(LakeSink.replaceWhere(spark, dirPart, fresh,
        Some(col("day") === target))))
    val ((vCow, rwCow, dropCow, delCow, insCow), tCow) =
      time(LakeSink.replaceWhere(spark, dirCow, fresh,
        Some(col("day") === target)))
    require(vPart == vPart0 + 1 && vCow == vCow0 + 1,
      "replace must be exactly ONE commit on both layouts")
    require(rwPart == 0,
      s"partitioned replace must not rewrite (rewrote $rwPart)")
    require(delPart == delCow && insPart == insCow && insPart == nFresh,
      s"twins disagree: part ($delPart del/$insPart ins) " +
        s"vs cow ($delCow del/$insCow ins), fresh $nFresh")

    val partWritten = dirBytes(dirPart) - basePart
    val cowWritten = dirBytes(dirCow) - baseCow

    // invariant: identical final tables
    val aPart = LakeSink.readTable(spark, dirPart)
      .agg(count(lit(1)), sum("vc")).head()
    val aCow = LakeSink.readTable(spark, dirCow)
      .agg(count(lit(1)), sum("vc")).head()
    require(aPart == aCow, s"twins disagree after replace: $aPart vs $aCow")

    println(f"""{"probe":"replace_where_backfill","sf":"$sfDir",""" +
      f""""replicas":$replicas,"n_rows":$nRows,"n_fresh":$nFresh,""" +
      f""""n_deleted":$delPart,""" +
      f""""part_sec":$tPart%.3f,"part_jobs":$jobsPart,""" +
      f""""part_dropped_segs":$dropPart,""" +
      f""""part_written_bytes":$partWritten,""" +
      f""""cow_sec":$tCow%.3f,"cow_rewritten_segs":$rwCow,""" +
      f""""cow_written_bytes":$cowWritten}""")
  }
}
