package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bloom segment-skipping cost probe (r12): the design claim is that
  * a POINT operation (GDPR delete, id lookup) on a bloom-indexed
  * high-cardinality column costs O(segments-that-may-hold-the-key)
  * instead of O(all segments) — on a layout where min/max stats are
  * provably useless (residue-class segments: every segment's [min,max]
  * spans the whole id domain). Two twin lakes from the same
  * N×-replicated events rows, 32 residue segments each, identical in
  * every way except the `bloom_cols` declaration:
  *
  *   bloom   = sidecars written at ingest; the point DELETE plans its
  *             touched-set from them (expected: 1 scanned + fp);
  *   nobloom = same data, no sidecars; the DELETE must count-scan all
  *             32 segments to find the one row.
  *
  * Reported per scale step: point-read scan set (scanned/total) and
  * seconds, point-DELETE seconds on both twins, sidecar bytes vs data
  * bytes (the plan-time read amplification), ingest overhead of
  * building the blooms. Invariant-checked: both twins hold identical
  * rows after their deletes, and the bloom read returns exactly the
  * probed row.
  */
object BloomPruneProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicasList =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 8)
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
    def dirBytes(p: String, sub: String = ""): Long = {
      val f = new java.io.File(if (sub.isEmpty) p else s"$p/$sub")
      if (!f.exists) 0L
      else org.apache.commons.io.FileUtils.sizeOfDirectory(f)
    }

    replicasList.foreach { replicas =>
      val base = Tables.events(spark, sfDir).select(
        col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      val span = base.agg(max("event_id")).head().getLong(0) + 1L
      val ev = (0 until replicas).map(r => base
          .withColumn("event_id", col("event_id") + lit(r * span)))
        .reduce(_ unionByName _).persist()
      val nRows = ev.count()
      val schema = ev.schema

      def build(bloom: Boolean): (String, Double) = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_bloomprobe_$bloom").toString
        LakeSink.createTable(dir, schema)
        if (bloom) LakeSink.setBloomColumns(spark, dir, Seq("event_id"))
        val (_, sec) = time {
          (0 until 32).foreach { i =>
            LakeSink.appendSegment(spark, dir,
              ev.filter(pmod(col("event_id"), lit(32)) === i),
              f"seg_b$i%02d")
          }
        }
        (dir, sec)
      }
      val (dirB, ingestB) = build(bloom = true)
      val (dirN, ingestN) = build(bloom = false)

      // a key that provably exists exactly once
      val probe = ev.agg(min("event_id")).head().getLong(0) + 12345L % span
      val probeVal = ev.filter(col("event_id") === probe).count() match {
        case 1L => probe
        case _ => ev.limit(1).head().getLong(0) // fallback: any real id
      }
      ev.unpersist()

      // point READ: bloom twin plans from sidecars, nobloom scans all
      val ((rows, scanned, total), readB) = time {
        val (df, sc, tot) = LakeSink.readTableWhereIn(
          spark, dirB, "event_id", Seq(probeVal))
        (df.count(), sc.size, tot)
      }
      val (rowsN, readN) = time {
        LakeSink.readTable(spark, dirN)
          .filter(col("event_id") === probeVal).count()
      }
      require(rows == rowsN && rows >= 1L,
        s"twins disagree on the probe: bloom=$rows full=$rowsN")

      // point DELETE: the write-amplification side of the same claim
      val ((_, rwB, _, delB), delSecB) = time {
        LakeSink.deleteWhere(spark, dirB, col("event_id") === probeVal)
      }
      val ((_, rwN, _, delN), delSecN) = time {
        LakeSink.deleteWhere(spark, dirN, col("event_id") === probeVal)
      }
      require(delB == delN,
        s"twins deleted different row counts: $delB vs $delN")
      val cb = LakeSink.readTable(spark, dirB)
        .agg(count(lit(1)), sum("vc")).head()
      val cn = LakeSink.readTable(spark, dirN)
        .agg(count(lit(1)), sum("vc")).head()
      require(cb == cn, s"twins diverged after delete: $cb vs $cn")

      val bloomBytes = dirBytes(dirB, "_blooms")
      val dataBytes = dirBytes(dirN)
      println(f"""{"probe":"bloom_prune","sf":"$sfDir",""" +
        f""""replicas":$replicas,"n_rows":$nRows,""" +
        f""""scanned":$scanned,"total":$total,""" +
        f""""read_bloom_sec":$readB%.3f,"read_full_sec":$readN%.3f,""" +
        f""""delete_bloom_sec":$delSecB%.3f,""" +
        f""""delete_bloom_rewrites":$rwB,""" +
        f""""delete_nobloom_sec":$delSecN%.3f,""" +
        f""""delete_nobloom_rewrites":$rwN,""" +
        f""""ingest_bloom_sec":$ingestB%.3f,""" +
        f""""ingest_nobloom_sec":$ingestN%.3f,""" +
        f""""bloom_bytes":$bloomBytes,"data_bytes":$dataBytes}""")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirB))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirN))
    }
    spark.stop()
  }
}
