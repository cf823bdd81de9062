package graft.tools

import graft.Tables
import graft.llm.DedupApi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe for the DEFAULT near-dup path (MinHash banding):
  * run the shingle → signature → band-join → verify pipeline on the
  * sf0.1 documents replicated N× (each replica's text perturbed with a
  * replica token so replicas are NOT duplicates of each other — the
  * candidate volume stays distribution-realistic instead of
  * adversarially colliding). On fixed cores, near-linear wall time in
  * N is the "banding is O(corpus + collisions), not O(n²)" signal the
  * 100 TB design rests on; the blocked all-pairs baseline
  * (llm_dedup_ngram's shape) is measured alongside to show the
  * contrast growing with N.
  *
  * Usage: sbt "runMain graft.tools.DedupScaleProbe [maxFactor]"
  */
object DedupScaleProbe {
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
      .select("doc_id", "lang", "source", "text")

    def replicated(f: Int): DataFrame =
      (0 until f).map { i =>
        // salt EVERY token with the replica id: cross-replica shingle
        // sets are disjoint, so replicas are not near-dups of each
        // other and candidate volume stays distribution-realistic
        // (a weak perturbation — one appended token — leaves replica
        // pairs at J≈0.95 and candidates grow O(f²), measured)
        base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
          .withColumn("text", expr(
            s"array_join(transform(split(text, ' '), t -> concat('r$i', '_', t)), ' ')"))
      }.reduce(_ unionByName _)

    def minhashRun(docs: DataFrame): (Long, Long) = {
      val sh = DedupApi.withHashedShingles(
        DedupApi.withShingles(docs, "text"), "sh")
      val cands = DedupApi.minhashCandidates(sh, "doc_id", "shs")
      val nCand = cands.count()
      val nPairs = DedupApi.verifyPairs(cands, sh, "doc_id", "shs", 0.5).count()
      (nCand, nPairs)
    }

    // warm the pipeline shapes once so factor-1 isn't charged codegen
    minhashRun(replicated(1))

    var f = 1
    while (f <= maxF) {
      val docs = replicated(f).cache()
      val n = docs.count()
      val t0 = System.nanoTime()
      val (nCand, nPairs) = minhashRun(docs)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"minhash  f=$f%2d docs=$n%8d cand=$nCand%8d pairs=$nPairs%6d " +
        f"time=$secs%7.2fs throughput=${n / secs}%9.0f docs/s")
      docs.unpersist()
      f *= 4
    }
    spark.stop()
  }
}
