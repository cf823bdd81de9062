package graft.tools

import graft.Scratch.tmpPathRaw
import graft.Tables
import graft.llm.DedupApi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe for the INCREMENTAL dedup ledger: ingest a FIXED
  * batch against a ledger built from the sf0.1 documents replicated
  * 1×/4×/16× (token-salted so replicas are not near-dups of each
  * other — history volume grows, planted-dup density does not). The
  * claim under test is the one the 100 TB design rests on: per-ingest
  * cost is dominated by the BATCH side — the ledger side is
  * pre-bucketed (digest join ships no ledger rows through a shuffle;
  * the fingerprint index is probed by the batch's exploded
  * fingerprints only) — so ingest wall time must grow far slower than
  * history size, and the status verdicts must be identical at every
  * factor (more unrelated history may add candidates, never change a
  * verdict).
  *
  * Usage: sbt "runMain graft.tools.LedgerScaleProbe [maxFactor]"
  */
object LedgerScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxF = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")

    def salted(df: DataFrame, i: Int, idShift: Long): DataFrame =
      df.withColumn("doc_id", col("doc_id") + lit(idShift))
        .withColumn("text", expr(
          s"array_join(transform(split(text, ' '), t -> concat('r$i', '_', t)), ' ')"))

    def prior(f: Int): DataFrame =
      (0 until f).map { i =>
        if (i == 0) base else salted(base, i, i.toLong * 1000000L)
      }.reduce(_ unionByName _)

    // fixed batch: 250 exact copies of base docs (dup_exact at every
    // factor), 250 near copies (last token dropped → dup_near), 250
    // salted-fresh docs (new at every factor)
    val batch = base.filter(col("doc_id") < 250)
        .withColumn("doc_id", col("doc_id") + 50000000L)
      .unionByName(base.filter(col("doc_id").between(250, 499))
        .withColumn("doc_id", col("doc_id") + 60000000L)
        .withColumn("text", expr(
          "array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')")))
      .unionByName(salted(
        base.filter(col("doc_id").between(500, 749)), 99, 70000000L))
      .cache()
    batch.count()

    var f = 1
    while (f <= maxF) {
      val tag = s"graft_ledger_probe_f$f"
      Seq(tag + "_dig", tag + "_fp", tag + "_set", tag + "_batch_dig")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val p = prior(f).cache()
      val nPrior = p.count()
      val tb0 = System.nanoTime()
      val (dig, fp, set) =
        DedupApi.writeLedger(p, "doc_id", "text", tag, tmpPathRaw)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      // warm once (codegen/footers), then measure the steady ingest
      DedupApi.dedupAgainstLedger(batch, "doc_id", "text",
        dig, fp, set, tag, tmpPathRaw).count()
      val t0 = System.nanoTime()
      val statuses = DedupApi.dedupAgainstLedger(batch, "doc_id", "text",
          dig, fp, set, tag, tmpPathRaw)
        .groupBy("status").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ingestSec = (System.nanoTime() - t0) / 1e9
      println(f"factor $f%2d: ledger $nPrior%7d docs  build $buildSec%6.2f s  " +
        f"ingest $ingestSec%6.2f s  statuses $statuses")
      p.unpersist()
      f *= 4
    }
    spark.stop()
  }
}
