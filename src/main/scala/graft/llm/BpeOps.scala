package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE-style vocabulary induction over the documents
  * corpus — the tokenizer-training step of an LLM data pipeline.
  *
  * The classic algorithm (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") trains on the
  * WORD-FREQUENCY DICTIONARY, not the raw corpus: the corpus is
  * reduced once to (word, freq) — at 100 TB that reduction is the
  * only corpus-sized shuffle, and its output (distinct words) is
  * orders of magnitude smaller but still far beyond driver memory, so
  * the dictionary STAYS a Dataset. Each merge round is then:
  *
  *   1. explode each word's adjacent symbol pairs weighted by freq
  *      (dictionary-sized, not corpus-sized),
  *   2. one aggregation shuffle to count pairs,
  *   3. ONE (pair, count) row to the driver — the argmax,
  *   4. a broadcast merge rule applied with a typed map.
  *
  * Ties break (count DESC, pair lexicographic) so training is fully
  * deterministic — same corpus, same merges, on any cluster layout.
  * Lineage is truncated with localCheckpoint every few rounds (the
  * same pattern as llm_dup_clusters' label propagation), so N merge
  * rounds never replay the corpus scan.
  */
object BpeOps {

  /** One learned merge: `left`+`right` fuse into one symbol; `rank`
    * is the round that learned it (lower = earlier = higher
    * priority at encode time). */
  final case class Merge(left: String, right: String, rank: Int)

  /** (symbols of one distinct word, its corpus frequency). */
  final case class DictEntry(syms: Seq[String], freq: Long)

  /** Reduce a corpus column to the BPE training dictionary:
    * whitespace pre-tokenization, one symbol per character. The one
    * corpus-sized aggregation in the whole trainer. */
  def dictionary(docs: DataFrame, textCol: String): Dataset[DictEntry] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"),
        col("freq"))
      .as[DictEntry]
  }

  /** Frequency-weighted adjacent-pair counts of a dictionary —
    * pure DataFrame ops, so the per-round count stays inside
    * whole-stage codegen; output columns (l, r, n). */
  private def pairCounts(dict: DataFrame): DataFrame =
    dict.select(col("freq"),
        explode(expr(
          """transform(slice(syms, 1, size(syms) - 1),
             (s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))"""))
          .as("p"))
      .select(col("freq"), col("p.l").as("l"), col("p.r").as("r"))
      .groupBy("l", "r").agg(sum("freq").as("n"))

  /** Train `numMerges` merges. Stops early if no pair occurs twice. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var dict = dictionary(docs, textCol).localCheckpoint(eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // deterministic argmax: max count, then lexicographic pair; a
      // pair seen once compresses nothing. ONE row reaches the driver.
      val best = pairCounts(dict.toDF())
        .filter(col("n") >= 2)
        .orderBy(desc("n"), col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(l, r, round)
        val fused = l + r
        // the merge scan is genuinely imperative (stateful left-to-
        // right fuse), so a typed map is the right tool here
        val applied = dict.map(e => e.copy(syms = mergeOnce(e.syms, l, r, fused)))
        // truncate lineage so later rounds never replay earlier maps
        dict = (if (round % 4 == 3) applied.localCheckpoint(eager = true)
                else applied)
        round += 1
      }
    }
    merges.toSeq
  }

  /** Left-to-right single-pass fuse of adjacent (l, r) — the same
    * order every reference BPE implementation uses. */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String,
      fused: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += fused; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode one word with a learned merge list (priority = rank).
    * Splits by CODEPOINT, not UTF-16 char, to match the dictionary's
    * `substring(w, i, 1)` semantics (Spark substring counts
    * codepoints) — a surrogate-pair emoji is one base symbol on both
    * paths. */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toSeq
    merges.sortBy(_.rank).foreach { m =>
      syms = mergeOnce(syms, m.left, m.right, m.left + m.right)
    }
    syms
  }

  /** Tokenize a corpus column with a trained merge list: the merges
    * broadcast (they are vocab-sized — KBs), the corpus never
    * re-shuffles. Returns (doc_id, n_tokens). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val n = text.split("\\s+").iterator.filter(_.nonEmpty)
          .map(w => encodeWord(w, bc.value).length.toLong).sum
        (id, n)
      }.toDF("doc_id", "n_tokens")
  }

  /** The oracle-checkable kernel of round one: frequency-weighted
    * adjacent character-pair counts over the word dictionary — what
    * the first merge argmax reads. DuckDB reproduces it exactly
    * (LATERAL generate_series + substr), so the corpus-to-dictionary
    * reduction and the pair weighting are both hash-verified; the
    * iterative rounds on top are property-tested against an in-spec
    * reference implementation (BpeSpec). */
  private val bpePairCounts = QueryDef(
    "llm_bpe_pair_counts",
    (s, d) => {
      val docs = Tables.documents(s, d)
      docs.select(explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .select(col("freq"),
          explode(expr(
            "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))"))
            .as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(desc("n"), col("pair"))
        .limit(50)
    },
    Some("""WITH words AS (
              SELECT unnest(string_split_regex(text, '\s+')) AS w
              FROM documents),
            dict AS (
              SELECT w, count(*) AS freq FROM words
              WHERE length(w) >= 2 GROUP BY w),
            pairs AS (
              SELECT substr(d.w, t.i, 2) AS pair, d.freq
              FROM dict d, LATERAL (
                SELECT unnest(generate_series(1, length(d.w) - 1)) AS i) t)
            SELECT pair, CAST(sum(freq) AS BIGINT) AS n
            FROM pairs GROUP BY pair
            ORDER BY n DESC, pair LIMIT 50"""))

  val defs: Seq[QueryDef] = Seq(bpePairCounts)
}
