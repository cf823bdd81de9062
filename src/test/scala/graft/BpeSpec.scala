package graft

import graft.llm.BpeOps
import graft.llm.BpeOps.Merge
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer vs an in-spec single-node reference implementation —
  * the distributed pair-count/argmax/merge loop must reproduce the
  * classic algorithm exactly, tie-break included. */
class BpeSpec extends AnyFunSuite with SparkFixture {

  /** Straight-line reference BPE on a (word -> freq) map. */
  private def referenceTrain(words: Map[String, Long], n: Int): Seq[Merge] = {
    var dict: Map[Seq[String], Long] =
      words.map { case (w, f) => (w.map(_.toString): Seq[String]) -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var done = false
    while (round < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + f
        }
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val ((l, r), _) = eligible.minBy { case ((l, r), c) => (-c, l, r) }
        out += Merge(l, r, round)
        dict = dict.groupMapReduce(
          { case (syms, _) => BpeOps.mergeOnce(syms, l, r, l + r) })(_._2)(_ + _)
        round += 1
      }
    }
    out.toSeq
  }

  private val corpusWords: Seq[(String, Int)] = Seq(
    "hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)

  private def corpusDf = {
    import spark.implicits._
    // one doc per word occurrence keeps the word-frequency reduction honest
    corpusWords.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("distributed trainer reproduces the reference merges exactly") {
    val expected = referenceTrain(
      corpusWords.map { case (w, n) => w -> n.toLong }.toMap, 8)
    val got = BpeOps.train(corpusDf, "text", 8)
    assert(got == expected,
      s"merge sequences diverge:\n got=$got\n exp=$expected")
    // the fixture is known to exhaust below 8 useful merges — make
    // sure the early-stop path actually ran
    assert(got.size < 8, s"expected early exhaustion, got ${got.size} merges")
  }

  test("trainer is deterministic across partition layouts") {
    val a = BpeOps.train(corpusDf.repartition(1), "text", 6)
    val b = BpeOps.train(corpusDf.repartition(7), "text", 6)
    assert(a == b, s"partitioning changed the learned merges:\n $a\n $b")
  }

  test("batched trainer (batchK > 1) equals the sequential trainer " +
      "byte-for-byte, including across merge interactions") {
    import spark.implicits._
    // Adversarial interaction: (a,b)=10, (x,a)=8 SHARES a symbol with
    // it and SURVIVES the merge untouched (no b next to the x-a
    // adjacency), (c,d)=6 is disjoint. A naive top-k-disjoint batch
    // would learn [(a,b),(c,d)] in round 1 and misorder (x,a);
    // sequential order is [(a,b),(x,a),(c,d)]. The cut filter must
    // keep round 1 to (a,b) alone, then batch [(x,a),(c,d)] together.
    val words = Seq("ab" -> 10, "xa" -> 8, "cd" -> 6)
    val df = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val expected = referenceTrain(
      words.map { case (w, n) => w -> n.toLong }.toMap, 5)
    assert(expected.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("x", "a"), ("c", "d")), s"fixture drifted: $expected")
    val seq1 = BpeOps.train(df, "text", 5, batchK = 1)
    val (batched, rounds) = BpeOps.trainWithStats(df, "text", 5, batchK = 64)
    assert(seq1 == expected, s"sequential path drifted: $seq1")
    assert(batched == expected,
      s"batched merges diverge:\n got=$batched\n exp=$expected")
    assert(rounds == 2, s"expected 2 Spark rounds for 3 merges, got $rounds")

    // and on the richer fixture corpus: identical tables, fewer rounds
    val s = BpeOps.train(corpusDf, "text", 8, batchK = 1)
    val (b8, r8) = BpeOps.trainWithStats(corpusDf, "text", 8, batchK = 64)
    assert(b8 == s, s"batched diverges on fixture corpus:\n $b8\n $s")
    assert(r8 <= s.size, s"batching never reduced rounds: $r8 vs ${s.size} merges")
  }

  test("encodeWord applies merges by rank and tokenCounts matches it") {
    val merges = BpeOps.train(corpusDf, "text", 6)
    // six merges fully compress this tiny fixture's frequent words
    val hug = BpeOps.encodeWord("hug", merges)
    val hugs = BpeOps.encodeWord("hugs", merges)
    assert(hug.length < 3 && hugs.length < 4,
      s"no compression learned: hug=$hug hugs=$hugs")
    assert(hug.mkString == "hug" && hugs.mkString == "hugs",
      s"symbols lost characters: hug=$hug hugs=$hugs")
    val counts = BpeOps.tokenCounts(corpusDf, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpusWords.foreach { case (w, _) =>
      val enc = BpeOps.encodeWord(w, merges).length.toLong
      // every doc is exactly one word in this fixture
      val docIds = corpusDf.filter(org.apache.spark.sql.functions.col("text") === w)
        .select("doc_id").collect().map(_.getLong(0))
      docIds.foreach(id => assert(counts(id) == enc,
        s"doc $id ($w): tokenCounts=${counts(id)} encodeWord=$enc"))
    }
  }

  test("codepoint symbols: dictionary and encodeWord agree on non-BMP text") {
    import spark.implicits._
    val word = "a😀b" // a😀b — the emoji is ONE symbol
    val df = Seq((1L, word)).toDF("doc_id", "text")
    val dictSyms = BpeOps.dictionary(df, "text").collect()(0).syms
    assert(dictSyms == BpeOps.encodeWord(word, Nil), dictSyms.toString)
    assert(dictSyms.length == 3, s"surrogate pair split: $dictSyms")
  }

  test("unknown text still encodes (merges just do not fire)") {
    val merges = Seq(Merge("a", "b", 0))
    assert(BpeOps.encodeWord("xyz", merges) == Seq("x", "y", "z"))
    assert(BpeOps.encodeWord("ab", merges) == Seq("ab"))
    assert(BpeOps.encodeWord("aab", merges) == Seq("a", "ab"))
  }

  test("encodeTokens matches per-word encodeWord, positions in doc order") {
    import spark.implicits._
    val merges = BpeOps.train(corpusDf, "text", 6)
    val df = Seq((1L, "hug pun"), (2L, "bun hugs pug")).toDF("doc_id", "text")
    val got = BpeOps.encodeTokens(df, "doc_id", "text", merges)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      }
    val exp = Map(
      1L -> Seq("hug", "pun").flatMap(BpeOps.encodeWord(_, merges)),
      2L -> Seq("bun", "hugs", "pug").flatMap(BpeOps.encodeWord(_, merges)))
    assert(got == exp, s"got=$got exp=$exp")
  }

  test("vocabulary ids: base sorted first, fused by rank; unknown is -1") {
    import spark.implicits._
    val merges = Seq(Merge("u", "g", 0), Merge("h", "ug", 1))
    val vocab = BpeOps.vocabulary(Seq("u", "g", "h", "b"), merges)
    assert(vocab == Map(
      "b" -> 0L, "g" -> 1L, "h" -> 2L, "u" -> 3L, "ug" -> 4L, "hug" -> 5L))
    val df = Seq((1L, "hug bx")).toDF("doc_id", "text")
    val ids = BpeOps.encodeIds(df, "doc_id", "text", merges, vocab)
      .orderBy("pos").collect().map(_.getLong(2)).toSeq
    // hug -> 5; b -> 0; x -> unknown -> -1
    assert(ids == Seq(5L, 0L, -1L), ids.toString)
  }

  test("round trip: encoding with trained merges leaves no learned pair") {
    // after applying merges in rank order, no adjacent token pair may
    // equal a learned merge — i.e. encode∘train drives the learned
    // pairs' corpus counts to zero (the compression fixpoint property)
    val merges = BpeOps.train(corpusDf, "text", 6)
    assert(merges.nonEmpty)
    val learned = merges.map(m => (m.left, m.right)).toSet
    val tokens = BpeOps.encodeTokens(corpusDf, "doc_id", "text", merges)
      .collect()
      .groupBy(_.getLong(0))
      .values.map(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq)
    tokens.foreach { ts =>
      ts.sliding(2).filter(_.size == 2).foreach { p =>
        assert(!learned.contains((p.head, p(1))),
          s"learned pair ${p.head}+${p(1)} survived encoding in $ts")
      }
    }
  }

  test("rank-indexed encoder == reference encoder: trained tables, " +
      "adversarial overlap words, pathological double-derivation table") {
    // 1. tables actually produced by training (the real regime)
    val trained = BpeOps.train(corpusDf, "text", 8)
    val corpusVocab = corpusWords.map(_._1)
    // 2. adversarial overlap words: overlapping repeats are where
    // left-to-right fuse order and re-created adjacencies live
    val adversarial = Seq("", "a", "aa", "aaa", "aaaa", "aaaaaaa",
      "abab", "ababab", "aabbaabb", "abba", "baab", "hughug", "hugshugs",
      "punpunpun", "ugugug", "gugu", "uggu", "hhuugg", "a😀😀a",
      "xyzzy", "hug", "hugs", "pug", "pun", "bun")
    // 3. a PATHOLOGICAL hand-built table where the same fused string
    // ("abc") has two derivations at different ranks — the case where
    // the GPT-2 min-rank-loop formulation diverges from the
    // sequential reference (fusing rank-4 (a,bc) re-creates the
    // rank-2 (abc, x) adjacency; the reference has already passed
    // rank 2 and must NOT fire it). This pins the fast encoder to the
    // reference semantics, not merely to "some BPE".
    val patho = Seq(Merge("a", "b", 0), Merge("ab", "c", 1),
      Merge("abc", "x", 2), Merge("b", "c", 3), Merge("a", "bc", 4))
    // also: negative and gapped ranks (the fixedMerges reversal spec
    // relies on negative ranks being honored)
    val weird = Seq(Merge("a", "b", -5), Merge("ab", "b", -2),
      Merge("b", "a", 7), Merge("abb", "ba", 100))
    // TIED ranks apply in list order (the reference's sortBy is
    // stable), and a pair learned at SEVERAL ranks fires at each —
    // the r16 review's two divergence traps for a rank-keyed index
    val tied = Seq(Merge("a", "b", 5), Merge("c", "d", 5),
      Merge("ab", "cd", 5))
    val dup = Seq(Merge("ab", "c", 1), Merge("a", "b", 3),
      Merge("ab", "c", 5))
    // 4. deterministic pseudo-random words over a small alphabet —
    // small alphabets maximize pair collisions per word
    val rnd = new scala.util.Random(42)
    val randWords = (0 until 400).map { _ =>
      val len = rnd.nextInt(25)
      (0 until len).map(_ => "abcx".charAt(rnd.nextInt(4))).mkString
    }
    // pin the two trap tables directly (a failure here is easier to
    // read than a property counterexample)
    assert(BpeOps.encoder(tied)("abcd") ==
      BpeOps.encoderReference(tied)("abcd"))
    assert(BpeOps.encoder(tied)("abcd") == Seq("abcd"),
      BpeOps.encoder(tied)("abcd").toString)
    assert(BpeOps.encoder(dup)("abcabc") ==
      BpeOps.encoderReference(dup)("abcabc"))
    assert(BpeOps.encoder(dup)("abcabc") == Seq("abc", "abc"),
      BpeOps.encoder(dup)("abcabc").toString)
    for (table <- Seq(trained, patho, weird, tied, dup, BpeOps.fixedMerges);
         words <- Seq(corpusVocab, adversarial, randWords)) {
      val fast = BpeOps.encoder(table)
      val ref = BpeOps.encoderReference(table)
      words.foreach { w =>
        assert(fast(w) == ref(w),
          s"encoders diverge on '$w' with table $table:\n" +
            s" fast=${fast(w)}\n ref =${ref(w)}")
      }
    }
    // the pathological table exercises what it claims: the word that
    // separates the two formulations really takes the two-path route
    val ref = BpeOps.encoderReference(patho)
    assert(ref("aabcx") == Seq("a", "abc", "x") ||
      ref("aabcx") == Seq("a", "abcx"), ref("aabcx").toString)
  }

  test("rank-indexed encoder cost is independent of vocabulary size " +
      "(4k-merge chain table encodes without scanning every rule)") {
    // chain table: rank i fuses ("a" + "b"*i, "b") — 4000 well-formed
    // merges, every one applicable to the probe word in sequence (the
    // worst case for BOTH encoders, and the best case for exposing an
    // O(|merges|)-passes-per-word encoder on words that use none)
    val n = 4000
    val chain = (0 until n).map(i => Merge("a" + "b" * i, "b", i))
    val fast = BpeOps.encoder(chain)
    val ref = BpeOps.encoderReference(chain)
    // a word that uses the whole chain...
    val deep = "a" + "b" * 64
    assert(fast(deep) == Seq(deep) && ref(deep) == Seq(deep))
    // ...and words that use none of it: the fast path's work must not
    // scale with the 4k-rule table (timed evidence in BASELINE.md via
    // BpeEncodeProbe; here we pin correctness on both regimes)
    val untouched = Seq("zzzz", "bbbbbbba", "cdcdcd", "b" * 40)
    untouched.foreach(w => assert(fast(w) == ref(w), w))
  }

  test("fixedMerges rank order matters: shuffled ranks change the output") {
    // the fixed table deliberately contains rank-dependent merges —
    // prove the dependency is real by reversing priorities
    val fwd = BpeOps.encodeWord("join", BpeOps.fixedMerges)
    assert(fwd == Seq("join"), fwd.toString)
    val rev = BpeOps.fixedMerges.map(m => m.copy(rank = -m.rank))
    assert(BpeOps.encodeWord("join", rev) != fwd,
      "reversed merge priority should break the jo+in chain")
  }
}
