package graft

import graft.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Custom expressions: interpreted eval vs codegen vs reference Scala
  * implementations, plus seeded randomized property checks. */
class FunctionsSpec extends AnyFunSuite with SparkFixture {

  private def arr(xs: Array[Float]) = new GenericArrayData(xs.map(x => x: Any))

  test("DotProduct.nullSafeEval matches a plain Scala fold") {
    val rnd = new Random(42)
    (1 to 50).foreach { _ =>
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      val got = DotProduct(null, null).nullSafeEval(arr(a), arr(b))
      assert(got == expected) // bit-exact, not approximate
    }
  }

  test("DotProduct codegen path agrees with interpreted eval") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (1 to 100).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(_.getDouble(1))
    val expected = rows.map { case (_, a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    assert(got.toSeq == expected)
  }

  test("CosineSimilarity: cos(v,v) == 1 within 1e-12; scale invariance") {
    val rnd = new Random(11)
    (1 to 30).foreach { _ =>
      val v = Array.fill(32)(rnd.nextFloat() + 0.1f)
      val v2 = v.map(_ * 3.0f)
      val self = CosineSimilarity(null, null).nullSafeEval(arr(v), arr(v)).asInstanceOf[Double]
      val scaled = CosineSimilarity(null, null).nullSafeEval(arr(v), arr(v2)).asInstanceOf[Double]
      assert(math.abs(self - 1.0) < 1e-12)
      assert(math.abs(scaled - 1.0) < 1e-6) // float cast of v*3 loses a few ulps
    }
  }

  test("MinHashSig: permutation-min property and shuffle invariance") {
    val rnd = new Random(3)
    val hs = Array.fill(40)(rnd.nextLong())
    val sig = MinHashSig(null, 16).nullSafeEval(new GenericArrayData(hs.map(x => x: Any)))
      .asInstanceOf[GenericArrayData].toLongArray()
    (0 until 16).foreach { i =>
      assert(sig(i) == hs.map(h => HashUtil.mix(h + i)).min)
    }
    val shuffled = rnd.shuffle(hs.toSeq).toArray
    val sig2 = MinHashSig(null, 16).nullSafeEval(new GenericArrayData(shuffled.map(x => x: Any)))
      .asInstanceOf[GenericArrayData].toLongArray()
    assert(sig.toSeq == sig2.toSeq, "minhash must be order-invariant")
  }

  test("MinHash Jaccard estimate tracks true Jaccard") {
    // Two sets with known overlap: J = 50/150 ≈ 0.333.
    val base = (1L to 200L).map(HashUtil.mix) // well-spread "element hashes"
    val setA = base.take(100).toArray
    val setB = base.slice(50, 150).toArray
    def sig(xs: Array[Long]) =
      MinHashSig(null, 256).nullSafeEval(new GenericArrayData(xs.map(x => x: Any)))
        .asInstanceOf[GenericArrayData].toLongArray()
    val (sa, sb) = (sig(setA), sig(setB))
    val agree = sa.zip(sb).count { case (x, y) => x == y }
    val est = agree.toDouble / 256
    assert(math.abs(est - 1.0 / 3.0) < 0.1, s"estimate $est far from 0.333")
  }

  test("SimHash64: identical inputs collide; disjoint inputs differ") {
    val rnd = new Random(5)
    val hs = Array.fill(50)(rnd.nextLong())
    def sh(xs: Array[Long]) =
      SimHash64(null).nullSafeEval(new GenericArrayData(xs.map(x => x: Any)))
        .asInstanceOf[Long]
    assert(sh(hs) == sh(rnd.shuffle(hs.toSeq).toArray), "order-invariant")
    val near = hs.dropRight(1) // one token removed
    val far = Array.fill(50)(rnd.nextLong())
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(hs), sh(near)) <= 12, "near-dup should have small hamming")
    assert(ham(sh(hs), sh(far)) > 12, "unrelated doc should be far")
  }

  test("SortedIntersectCount equals Set intersection size") {
    val rnd = new Random(13)
    (1 to 50).foreach { _ =>
      val a = Array.fill(rnd.nextInt(60) + 1)(rnd.nextLong() % 100).distinct.sorted
      val b = Array.fill(rnd.nextInt(60) + 1)(rnd.nextLong() % 100).distinct.sorted
      val got = SortedIntersectCount(null, null).nullSafeEval(
        new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any))).asInstanceOf[Int]
      assert(got == a.toSet.intersect(b.toSet).size)
    }
  }

  test("WeightedMean aggregator: reduce/merge algebra and finish") {
    val in = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 1.0))
    val b1 = in.take(1).foldLeft(WeightedMean.zero)(WeightedMean.reduce)
    val b2 = in.drop(1).foldLeft(WeightedMean.zero)(WeightedMean.reduce)
    val merged = WeightedMean.merge(b1, b2)
    assert(WeightedMean.finish(merged) == (10.0 + 60.0 + 30.0) / 5.0)
    assert(WeightedMean.finish(WeightedMean.zero) == 0.0) // empty-safe
    // merge order must not matter
    assert(WeightedMean.merge(b2, b1) == merged.swap.swap)
  }

  test("GraftExtensions injects all engine functions without error") {
    // extensions can only take full effect on a fresh SparkContext;
    // here we validate the injection hook itself wires every builder
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // and the same builders resolve through the per-session registry path
    graft.functions.VectorFunctions.register(spark)
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(spark,
      "ngram_hashes_t", es => graft.functions.NGramHashes(es.head, 3))
    import spark.implicits._
    val n = Seq(Seq("a", "b", "c", "d")).toDF("toks")
      .selectExpr("size(ngram_hashes_t(toks)) AS n").collect()(0).getInt(0)
    assert(n == 2)
  }

  test("dot_product / cosine_similarity are SQL-callable after register") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = df.selectExpr("dot_product(a, b) AS d", "cosine_similarity(a, a) AS c")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  // ------------------------------------------------------------------
  // SentenceSplit — the custom Catalyst Generator (UDTF seam, §2g)
  // ------------------------------------------------------------------

  /** Reference semantics: regex split + drop empty fragments (what the
    * DuckDB oracle computes with regexp_split_to_array). */
  private def refSplit(s: String): Seq[String] =
    s.split("[.!?]+[ \t\n\r]+", -1).toSeq.filter(_.nonEmpty)

  test("SentenceSplit.split matches the regex reference on adversarial random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    val alphabet = ".!? \t\n\rabX".toCharArray
    val rnd = new Random(1234)
    (1 to 2000).foreach { _ =>
      val s = Array.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = SentenceSplit.split(UTF8String.fromString(s)).map(_.toString).toSeq
      assert(got == refSplit(s), s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("SentenceSplit known cases: delimiter dropped, trailing punct kept, empties filtered") {
    import org.apache.spark.unsafe.types.UTF8String
    def sp(s: String) = SentenceSplit.split(UTF8String.fromString(s)).map(_.toString).toSeq
    assert(sp("One. Two! Three?") == Seq("One", "Two", "Three?"))
    assert(sp("a..b. c") == Seq("a..b", "c"))
    assert(sp("x. . y") == Seq("x", "y"))
    assert(sp("3.14 is pi. ok") == Seq("3.14 is pi", "ok"))
    assert(sp("") == Seq.empty)
    assert(sp(". ") == Seq.empty)
    assert(sp("no boundary") == Seq("no boundary"))
  }

  test("SentenceSplit generator: expansion, ordinals, and null → zero rows") {
    import spark.implicits._
    val df = Seq((1L, "A b. C d! E"), (2L, null.asInstanceOf[String]), (3L, "solo"))
      .toDF("id", "t")
      .select(col("id"), SentenceSplit.splitSentences(col("t")))
    val rows = df.orderBy("id", "pos").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 0, "A b"), (1L, 1, "C d"), (1L, 2, "E"), (3L, 0, "solo")))
  }

  test("SentenceSplit runs inside whole-stage codegen (GenerateExec, no UDF)") {
    import spark.implicits._
    val df = Seq((1L, "A b. C d! E")).toDF("id", "t")
      .select(col("id"), SentenceSplit.splitSentences(col("t")))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("Generate split_sentences"), phys)
    assert(!phys.contains("BatchEvalPython") && !phys.contains("Invoke"), phys)
    // the generated source must contain the static splitter call —
    // direct evidence GenerateExec codegens around this generator
    // rather than falling back to interpreted eval
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("splitToArrayData"), codegen.take(2000))
  }

  test("SentenceSplit is SQL-callable via extensions-style registration") {
    graft.llm.TextOps // ensure object init side effects don't interfere
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(
      spark, "split_sentences", es => SentenceSplit(es.head))
    import spark.implicits._
    Seq((1L, "A. B")).toDF("id", "t").createOrReplaceTempView("ss_t")
    val got = spark.sql(
      "SELECT id, pos, sentence FROM ss_t LATERAL VIEW split_sentences(t) g AS pos, sentence")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 0, "A"), (1L, 1, "B")))
  }

  test("fn_bitwise agrees with JVM bit arithmetic on a known row") {
    val r = SparkEntry.queries("fn_bitwise")(spark, sfDir)
      .filter("event_id = 42").collect()(0)
    val uid = Tables.events(spark, sfDir)
      .filter("event_id = 42").select("user_id").collect()(0).getLong(0)
    assert(r.getLong(1) == (uid & 255L))
    assert(r.getLong(2) == (uid | 4096L))
    assert(r.getLong(3) == (uid ^ 42L))
    assert(r.getLong(4) == (uid << 3))
    assert(r.getLong(5) == (uid >> 2))
    assert(r.getLong(6) == java.lang.Long.bitCount(uid).toLong)
  }
}
