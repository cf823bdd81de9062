package graft.tools

import graft.streaming.LakeSink
import graft.streaming.LakeSink.{LongStat, Manifest}

/** Manifest-LOG scale probe (pure metadata — no SparkSession): drives
  * ≥10 k commits through (a) the r11 delta log (commitNext: delta
  * records + every-32nd-version snapshots) and (b) the pre-r11
  * full-snapshot-per-commit design (commitManifest), measuring
  * per-1 000-commit wall time, cumulative manifest bytes, and tip-read
  * latency. The full-rewrite design's commit cost grows linearly with
  * the segment count — with one segment appended per commit that is
  * O(commits²) cumulative write volume; the log's per-commit cost is
  * O(edit) with an amortized O(segments/interval) snapshot share, so
  * its per-1k wall stays near-flat. Both chains must reconstruct the
  * IDENTICAL final state (asserted field-for-field) — the log is a
  * representation change, not a semantics change.
  *
  * Usage: sbt "runMain graft.tools.ManifestScaleProbe [commits]"
  */
object ManifestScaleProbe {

  private def dirSize(p: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(java.nio.file.Files.size).sum
    } finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val commits = if (args.nonEmpty) args(0).toInt else 10000
    val root = java.nio.file.Files.createTempDirectory("graft_mprobe")

    def run(mode: String): (Manifest, Seq[Double], Long, Double) = {
      val dir = root.resolve(mode).toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      var m = Manifest(0L, -1L, Vector.empty)
      val perK = Seq.newBuilder[Double]
      var t0 = System.nanoTime()
      (1 to commits).foreach { i =>
        val seg = s"seg_b$i"
        val bstats = Map("ts" -> LongStat(i * 1000L, i * 1000L + 999L, 0L))
        val next = Manifest(m.version + 1, i.toLong, m.segs :+ seg,
          stats = m.stats + (seg -> bstats))
        val ok = mode match {
          // the edit-aware path every internal writer uses (the DML
          // retry loop, the ingest sink): O(edit) per delta commit
          case "log" => LakeSink.commitEditRecord(dir, m, next,
            Set.empty, Seq(seg), Map(seg -> bstats))
          case "snapshot" => LakeSink.commitManifest(dir, next.version,
            next.maxB, next.segs, stats = next.stats)
        }
        require(ok, s"$mode commit $i lost a race (impossible here)")
        m = next
        if (i % 1000 == 0) {
          val t1 = System.nanoTime()
          perK += (t1 - t0) / 1e9
          t0 = t1
        }
      }
      val bytes = dirSize(java.nio.file.Paths.get(dir, "_manifest"))
      val r0 = System.nanoTime()
      val tip = LakeSink.readManifest(dir)
      val readSec = (System.nanoTime() - r0) / 1e9
      (tip, perK.result(), bytes, readSec)
    }

    val (tipLog, perKLog, bytesLog, readLog) = run("log")
    val (tipSnap, perKSnap, bytesSnap, readSnap) = run("snapshot")

    println(s"""{"mode":"log","per_1k_sec":[${perKLog.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""manifest_bytes":$bytesLog,"tip_read_sec":${f"$readLog%.3f"}}""")
    println(s"""{"mode":"snapshot","per_1k_sec":[${perKSnap.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""manifest_bytes":$bytesSnap,"tip_read_sec":${f"$readSnap%.3f"}}""")

    // identical reconstructed state — representation change only
    require(tipLog == tipSnap,
      s"log and snapshot chains diverged:\n$tipLog\nvs\n$tipSnap")
    // Growth accounting: the full-rewrite design's per-1k cost grows
    // linearly with the segment count (O(commits²) cumulative). The
    // log's per-DELTA cost is O(edit) flat, but its every-32nd-version
    // snapshot is still O(segments), so per-1k retains a LINEAR term
    // at 1/32 the slope — "flat" would be dishonest; the claims are
    // (a) structurally slower growth, (b) a large absolute per-commit
    // win at scale, (c) the write-volume collapse.
    val logGrowth = perKLog.last / perKLog.head
    val snapGrowth = perKSnap.last / perKSnap.head
    println(f"""{"log_last_over_first":$logGrowth%.2f,""" +
      f""""snapshot_last_over_first":$snapGrowth%.2f,""" +
      f""""per_commit_win_at_tail":${perKSnap.last / perKLog.last}%.1f,""" +
      f""""bytes_ratio_snapshot_over_log":${bytesSnap.toDouble / bytesLog}%.1f}""")
    require(logGrowth < snapGrowth / 2.0,
      f"delta-log growth $logGrowth%.2fx not structurally below " +
        f"full-rewrite growth $snapGrowth%.2fx")
    require(perKLog.last * 3.0 < perKSnap.last,
      f"expected >=3x per-commit win at the tail, got " +
        f"${perKSnap.last}%.2f vs ${perKLog.last}%.2f s/1k")
    require(bytesSnap > 5L * bytesLog,
      s"expected >=5x write-volume reduction, got $bytesSnap vs $bytesLog")
    println("[manifestscale] OK")
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }
}
