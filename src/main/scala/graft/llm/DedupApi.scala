package graft.llm

import graft.functions.TextHashFunctions.{minhashSig, simhash64, sortedIntersectCount}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public, parameterized dedup / similarity API — the library surface
  * a pipeline author calls on their own DataFrames (the `llm_*`
  * queries in [[TextOps]] are thin instantiations of these over the
  * test corpus).
  *
  * Every function takes and returns DataFrames and composes with any
  * upstream source; nothing collects to the driver.
  */
object DedupApi {

  /** Distinct word-n-gram shingles of a text column, as a new column. */
  def withShingles(df: DataFrame, textCol: String, out: String = "sh",
      n: Int = 3): DataFrame = {
    val spread = (0 until n)
      .map(k => s"element_at(__toks, i + $k)").mkString(", ")
    df.withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= n)
      .withColumn(out, expr(
        s"array_distinct(transform(sequence(1, size(__toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', $spread)))"))
      .drop("__toks")
  }

  /** Hashed + sorted shingle sets (the compact pairwise-compare form). */
  def withHashedShingles(df: DataFrame, shCol: String,
      out: String = "shs"): DataFrame =
    df.withColumn(out, expr(s"sort_array(transform($shCol, t -> xxhash64(t)))"))

  /** Exact Jaccard between two sorted-hash-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = sortedIntersectCount(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Exact dedup: one row per normalized-text digest with the keeper
    * (minimum id) and the copy count. Only 16-byte digests shuffle. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("h", md5(lower(trim(col(textCol)))))
      .groupBy("h")
      .agg(min(idCol).as("keep_" + idCol), count(lit(1)).as("n_copies"))

  /** MinHash-LSH candidate pairs over a hashed-shingle column:
    * signature → band explode → band equi-join. O(corpus + collisions),
    * never O(n²). Returns (idCol_a, idCol_b) with a < b. */
  def minhashCandidates(df: DataFrame, idCol: String, hashedShinglesCol: String,
      numHashes: Int = 64, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df.withColumn("__sig", minhashSig(col(hashedShinglesCol), numHashes))
    val banded = withSig
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(__sig, b * $rows + 1, $rows)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val a = banded.select(col(idCol).as(idCol + "_a"), col("band"), col("bh"))
    val b = banded.select(col(idCol).as(idCol + "_b"), col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .filter(col(idCol + "_a") < col(idCol + "_b"))
      .select(idCol + "_a", idCol + "_b").distinct()
  }

  /** Verify candidate pairs by exact Jaccard ≥ threshold. `sets` must
    * carry (idCol, sorted-hash-array col). */
  def verifyPairs(cands: DataFrame, sets: DataFrame, idCol: String,
      setCol: String, threshold: Double): DataFrame = {
    val sa = sets.select(col(idCol).as(idCol + "_a"), col(setCol).as("__sa"))
    val sb = sets.select(col(idCol).as(idCol + "_b"), col(setCol).as("__sb"))
    cands.join(sa, idCol + "_a").join(sb, idCol + "_b")
      .withColumn("j", round(jaccard(col("__sa"), col("__sb")), 4))
      .filter(col("j") >= threshold)
      .select(idCol + "_a", idCol + "_b", "j")
  }

  /** 64-bit weighted SimHash signatures of a text column. */
  def simhashSignatures(df: DataFrame, textCol: String,
      out: String = "sim"): DataFrame =
    df.withColumn("__hs", expr(s"transform(split($textCol, ' '), t -> xxhash64(t))"))
      .withColumn(out, simhash64(col("__hs")))
      .drop("__hs")

  /** Pairs of signatures within `maxHamming` via a multi-index over
    * PAIRS of bit-blocks: any signature pair within maxHamming has at
    * least two intact blocks (pigeonhole needs maxHamming ≤ blocks-2),
    * so it shares at least one intact block-pair. The combined
    * 2·width-bit keys keep candidate volume ~n²/2^(2·width) instead of
    * the single-block n²/2^width. */
  def simhashNearPairs(sigs: DataFrame, idCol: String, simCol: String,
      maxHamming: Int = 6, blocks: Int = 8): DataFrame = {
    require(maxHamming <= blocks - 2,
      "block-pair completeness needs maxHamming <= blocks - 2")
    require(64 % blocks == 0, "blocks must divide 64")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val blocked = sigs
      .select(col(idCol), col(simCol),
        posexplode(expr(
          s"""flatten(transform(sequence(0, ${blocks - 2}), i ->
             |  transform(sequence(i + 1, ${blocks - 1}), j ->
             |    named_struct('pair', i * $blocks + j,
             |      'v', shiftleft(shiftright($simCol, i * $width) & $mask, $width)
             |           | (shiftright($simCol, j * $width) & $mask)))))""".stripMargin)))
      .select(col(idCol), col(simCol),
        col("col.pair").as("pair"), col("col.v").as("bv"))
    val a = blocked.select(col(idCol).as(idCol + "_a"), col(simCol).as("__sa"),
      col("pair"), col("bv"))
    val b = blocked.select(col(idCol).as(idCol + "_b"), col(simCol).as("__sb"),
      col("pair"), col("bv"))
    a.join(b, Seq("pair", "bv"))
      .filter(col(idCol + "_a") < col(idCol + "_b"))
      .select(idCol + "_a", idCol + "_b", "__sa", "__sb").distinct()
      .withColumn("hamming", expr("bit_count(__sa ^ __sb)"))
      .filter(col("hamming") <= maxHamming)
      .select(idCol + "_a", idCol + "_b", "hamming")
  }
}
