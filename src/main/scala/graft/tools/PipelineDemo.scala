package graft.tools

import graft.Tables
import graft.llm.{DedupApi, SimilarityApi}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end LLM-training-data pipeline composed from the public API —
  * what a user of the reference engine writes after switching to this
  * library. Every stage is a lazy DataFrame transform; nothing
  * collects to the driver; the whole chain is one Catalyst plan per
  * output.
  *
  * Stages: ingest → quality gate → language routing → exact dedup →
  * near-dup (MinHash-LSH candidates + exact-Jaccard verify) →
  * embedding join + similarity search.
  *
  * Usage: sbt "runMain graft.tools.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. Ingest: raw corpus (at 100 TB: partitioned parquet / stream).
    val docs = Tables.documents(spark, sfDir)
    println(s"[ingest]      ${docs.count()} documents")

    // 2. Quality gate: token count + type-token ratio + stopword ratio.
    val toks = split(col("text"), " ")
    val gated = docs
      .withColumn("n_tokens", size(toks))
      .withColumn("ttr",
        size(array_distinct(toks)).cast("double") / size(toks))
      .filter(col("n_tokens") >= 15 && col("ttr") >= 0.2)
    println(s"[quality]     ${gated.count()} pass the gate")

    // 3. Language routing (partition-prunable at scale).
    val routed = gated.filter(col("lang").isin("en", "fr"))
    println(s"[lang-route]  ${routed.count()} in target languages")

    // 4. Exact dedup: keep the smallest doc_id per normalized digest.
    val keepers = DedupApi.exactDedup(routed, "doc_id", "text")
      .select(col("keep_doc_id").as("doc_id"))
    val exactDeduped = routed.join(keepers, "doc_id")
    println(s"[exact-dedup] ${exactDeduped.count()} unique texts")

    // 5. Near-dup: MinHash-LSH candidates, exact-Jaccard verify, drop
    //    the higher id of each pair (keep-first policy).
    val sh = DedupApi.withHashedShingles(
      DedupApi.withShingles(exactDeduped, "text"), "sh")
    val nearPairs = DedupApi.verifyPairs(
      DedupApi.minhashCandidates(sh, "doc_id", "shs"),
      sh, "doc_id", "shs", threshold = 0.8)
    val drop = nearPairs.select(col("doc_id_b").as("doc_id")).distinct()
    val deduped = exactDeduped.join(drop, Seq("doc_id"), "left_anti")
    println(s"[near-dedup]  ${deduped.count()} after near-dup removal " +
      s"(${nearPairs.count()} verified near-pairs)")

    // 6. Join embeddings; nearest-neighbor similarity per kept doc.
    val emb = Tables.embeddings(spark, sfDir)
    val joined = deduped.join(emb, col("doc_id") === col("vec_id"))
    println(s"[embed-join]  ${joined.count()} docs with embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val top = SimilarityApi.topK(
      joined.select(col("doc_id"), col("embedding")), q, "doc_id", "embedding", 5)
    println(s"[similarity]  top-5 to query vector:")
    top.collect().foreach(r => println(f"    doc ${r.getLong(0)}%5d  sim=${r.getDouble(1)}%.4f"))

    spark.stop()
  }
}
