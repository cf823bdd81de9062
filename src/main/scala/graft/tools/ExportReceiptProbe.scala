package graft.tools

import graft.Tables
import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** EXPORT RECEIPT cost probe (r17 — the r16 verdict's #7 done-check):
  * `exportTable`'s receipt row count used to walk EVERY live
  * segment's parquet footers serially on the driver — O(segments)
  * metadata opens on a verb whose data path is O(links), so at
  * thousands of segments the receipt walk dominated the export. With
  * manifest-carried `segrows=` counts the receipt is an O(manifest)
  * sum.
  *
  * Method: two byte-identical N-segment lakes over the same rows —
  * one committed WITH per-segment counts (what every r17 writer
  * records), one WITHOUT (a legacy/foreign-writer manifest, the
  * footer-fallback regime). Both exports hard-link the same files;
  * the wall difference is the footer walk. Run at two widths to see
  * the slope.
  */
object ExportReceiptProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val widths = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(256, 1024)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, sfDir).select(
      col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))

    def mkLake(nSegs: Int, withRows: Boolean): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_exprcpt").toString
      val stage = s"$dir/_stage"
      // one file per segment (repartition by the bucket) — links stay
      // O(segments), so the receipt term is visible, not drowned
      ev.withColumn("__b", pmod(col("event_id"), lit(nSegs)))
        .repartition(col("__b"))
        .write.partitionBy("__b").parquet(stage)
      val segRows: Map[String, Long] =
        if (!withRows) Map.empty
        else ev.groupBy(pmod(col("event_id"), lit(nSegs)).as("__b"))
          .count().collect()
          .map(r => "seg_b%04d".format(r.getLong(0)) -> r.getLong(1))
          .toMap
      val segs = new java.io.File(stage).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("__b="))
        .sortBy(_.getName.stripPrefix("__b=").toInt)
        .map { f =>
          val seg = "seg_b%04d".format(f.getName.stripPrefix("__b=").toInt)
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(dir, seg))
          seg
        }.toSeq
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
      require(LakeSink.commitManifest(dir, 1L, 0L, segs,
        segRows = segRows), "probe ingest commit lost a race")
      dir
    }

    def timeExport(dir: String): (Double, Int, Long) = {
      val out = java.nio.file.Files
        .createTempDirectory("graft_exprcpt_out").toString
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val t0 = System.nanoTime()
      val (_, linked, _, _, rows) = LakeSink.exportTable(spark, dir, out)
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      (sec, linked, rows)
    }

    val rows = widths.map { n =>
      val withDir = mkLake(n, withRows = true)
      val withoutDir = mkLake(n, withRows = false)
      val (tM, lM, rM) = timeExport(withDir)
      val (tF, lF, rF) = timeExport(withoutDir)
      require(rM == rF && lM == lF,
        s"probe twins diverged: rows $rM/$rF links $lM/$lF")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(withDir))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(withoutDir))
      f"""{"segments":$n,"export_manifest_sec":$tM%.2f,""" +
        f""""export_footer_sec":$tF%.2f,"files_linked":$lM,"rows":$rM}"""
    }.mkString("[", ",", "]")
    println(s"""{"probe":"export_receipt","sf":"$sfDir","rows":$rows}""")
    spark.stop()
  }
}
