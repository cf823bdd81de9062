package graft.tools

import graft.llm.SimilarityApi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-volume scaling probe for sign-LSH banding: measures
  * banded candidate-pair counts on synthetic random unit vectors as
  * the corpus grows 4× per step, under (a) a FIXED band width — the
  * old clamped design, whose collision fraction n²/2^b is quadratic in
  * n — and (b) the corpus-adaptive width (SimilarityApi.adaptiveBandBits,
  * b ≈ log₂(n)−8, no ceiling), whose expected collisions are ~128·n
  * per band (n²/2^(b+1) with 2^b = n/256), i.e. LINEAR. A 4× corpus
  * step should multiply fixed-b candidates ~16× but adaptive-b
  * candidates ~4× — the probe asserts exactly that separation, which
  * is the measured justification for removing adaptiveBandBits' old
  * 16-bit ceiling (past ~10⁷ vectors the clamp made the "adaptive"
  * path identical to the fixed-b failure mode).
  *
  * Also exercises bandedCandidates' fail-loud bucket-skew guard: with
  * a deliberately tiny maxBucketRows the guard must refuse the join
  * and name the offending bucket, instead of silently launching a
  * quadratic stage.
  *
  * Corpus: deterministic pseudo-random unit vectors (components from
  * xxhash64(id, dim) mapped to [-1,1], L2-normalized) — sign bits are
  * i.i.d. uniform, the neutral case for collision accounting. Planes
  * are drawn from a disjoint id range of the same generator.
  *
  * Usage: sbt "runMain graft.tools.BandScaleProbe [maxN]"
  */
object BandScaleProbe {

  /** n deterministic random unit vectors (idCol, emb), ids offset so
    * different roles (corpus vs planes) never share generator ids. */
  private def randomUnitVectors(spark: SparkSession, n: Long, dim: Int,
      idOffset: Long, idCol: String, embCol: String): DataFrame =
    spark.range(n).select(
      col("id").as(idCol),
      expr(
        s"""transform(sequence(0, ${dim - 1}),
           |  d -> CAST(xxhash64(id + ${idOffset}L, d) AS DOUBLE) / 9.223372036854776e18)
           |""".stripMargin).as("__raw"))
      .withColumn(embCol, expr(
        s"""transform(__raw, x -> CAST(x / sqrt(aggregate(
           |  transform(__raw, y -> y * y), CAST(0.0 AS DOUBLE),
           |  (a, v) -> a + v)) AS FLOAT))""".stripMargin))
      .select(col(idCol), col(embCol))

  def main(args: Array[String]): Unit = {
    val maxN = if (args.nonEmpty) args(0).toLong else (1L << 16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 16
    val fixedBits = 8 // stand-in for the old ceiling: any constant b

    def candidates(n: Long, bits: Int): Long = {
      val emb = randomUnitVectors(spark, n, dim, 0L, "vid", "emb")
      // planes from a disjoint id range; 4 bands × bits planes
      val planes = randomUnitVectors(spark, 4L * bits, dim, 1L << 40,
        "p_id", "p_emb")
      val sigs = SimilarityApi.signBandSignatures(emb, planes, "vid", "emb",
        bandBits = bits)
      SimilarityApi.bandedCandidates(sigs, "vid", maxBucketRows = 1L << 22)
        .count()
    }

    val ns = Iterator.iterate(maxN / 16)(_ * 4).takeWhile(_ <= maxN)
      .filter(_ >= 1024).toSeq
    require(ns.size >= 2, s"need >= 2 scale points, got $ns (raise maxN)")

    var prevFixed = -1L; var prevAdaptive = -1L
    var fixedRatios = List.empty[Double]; var adaptiveRatios = List.empty[Double]
    ns.foreach { n =>
      val aBits = SimilarityApi.adaptiveBandBits(n)
      val t0 = System.nanoTime()
      val cFixed = candidates(n, fixedBits)
      val t1 = System.nanoTime()
      val cAdaptive = candidates(n, aBits)
      val t2 = System.nanoTime()
      val fr = if (prevFixed > 0) cFixed.toDouble / prevFixed else Double.NaN
      val ar = if (prevAdaptive > 0) cAdaptive.toDouble / prevAdaptive else Double.NaN
      println(f"""{"n":$n,"fixed_bits":$fixedBits,"adaptive_bits":$aBits,""" +
        f""""cand_fixed":$cFixed,"cand_adaptive":$cAdaptive,""" +
        f""""ratio_fixed":$fr%.2f,"ratio_adaptive":$ar%.2f,""" +
        f""""sec_fixed":${(t1 - t0) / 1e9}%.2f,"sec_adaptive":${(t2 - t1) / 1e9}%.2f}""")
      if (prevFixed > 0) { fixedRatios ::= fr; adaptiveRatios ::= ar }
      prevFixed = cFixed; prevAdaptive = cAdaptive
    }

    // the separation claim: per 4× corpus step, fixed-b candidate
    // growth must look quadratic (≫4×) and adaptive-b growth linear
    // (≈4×). Bounds are loose — the point is the ORDER of growth.
    fixedRatios.foreach { r =>
      assert(r > 8.0, f"fixed-b candidates grew only $r%.2fx per 4x " +
        "corpus — expected near-quadratic (~16x); probe data degenerate?")
    }
    adaptiveRatios.foreach { r =>
      assert(r < 8.0, f"adaptive-b candidates grew $r%.2fx per 4x " +
        "corpus — expected near-linear (~4x); adaptiveBandBits regressed?")
    }

    // fail-loud skew guard: a tiny cap must refuse the join loudly.
    val n = ns.head
    val emb = randomUnitVectors(spark, n, dim, 0L, "vid", "emb")
    val planes = randomUnitVectors(spark, 16L, dim, 1L << 41, "p_id", "p_emb")
    val sigs = SimilarityApi.signBandSignatures(emb, planes, "vid", "emb", 4)
    val guardMsg =
      try { SimilarityApi.bandedCandidates(sigs, "vid", maxBucketRows = 8); "NONE" }
      catch { case e: IllegalArgumentException => e.getMessage }
    assert(guardMsg.contains("quadratic"),
      s"skew guard did not fire or message unhelpful: $guardMsg")
    println(s"""{"skew_guard":"fired","excerpt":"${guardMsg.take(80).replace('"', '\'')}"}""")
    println("[bandscale] OK")
    spark.stop()
  }
}
