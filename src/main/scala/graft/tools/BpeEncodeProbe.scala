package graft.tools

import graft.llm.BpeOps
import graft.llm.BpeOps.Merge

/** Evidence probe for the r16 rank-indexed BPE encoder: per-word
  * encode cost as the merge table grows 250 → 1000 → 4000 rules.
  *
  * The pre-r16 reference encoder ([[BpeOps.encoderReference]]) makes
  * one [[BpeOps.mergeOnce]] pass per RULE per word — linear in
  * vocabulary size even for words the vocabulary never touches. The
  * shipped encoder ([[BpeOps.encoder]]) scans only the word's own
  * adjacencies, so its per-word cost must stay near-flat across the
  * same growth. No Spark session: the encoder is driver/executor-side
  * scalar code and the probe times exactly that.
  *
  * Word mix: 2000 deterministic pseudo-random words (seed 42, length
  * ≤ 24, alphabet a/b/c/x) — mostly untouched by the chain table —
  * plus 100 deep-chain words that fuse ~64 rules each; both regimes a
  * real tokenizer meets. Prints one JSON line with µs/word per table
  * size for both encoders.
  */
object BpeEncodeProbe {

  private def words(): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val rand = (0 until 2000).map { _ =>
      val len = rnd.nextInt(25)
      (0 until len).map(_ => "abcx".charAt(rnd.nextInt(4))).mkString
    }
    val deep = Seq.fill(100)("a" + "b" * 64)
    rand ++ deep
  }

  private def chain(n: Int): Seq[Merge] =
    (0 until n).map(i => Merge("a" + "b" * i, "b", i))

  /** Median-of-5 timed passes (µs per word), after 2 warmups. */
  private def time(enc: String => Seq[String], ws: Seq[String]): Double = {
    var sink = 0L // defeat dead-code elimination
    (0 until 2).foreach(_ => ws.foreach(w => sink += enc(w).length))
    val runs = (0 until 5).map { _ =>
      val t0 = System.nanoTime()
      ws.foreach(w => sink += enc(w).length)
      (System.nanoTime() - t0) / 1000.0 / ws.size
    }.sorted
    require(sink != 0L)
    runs(2)
  }

  def main(args: Array[String]): Unit = {
    val ws = words()
    val sizes = Seq(250, 1000, 4000)
    val rows = sizes.map { n =>
      val table = chain(n)
      val fast = time(BpeOps.encoder(table), ws)
      val ref = time(BpeOps.encoderReference(table), ws)
      // equivalence re-checked on the probe's own word mix
      val fe = BpeOps.encoder(table); val re = BpeOps.encoderReference(table)
      ws.foreach(w => require(fe(w) == re(w), s"diverged on $w at n=$n"))
      (n, fast, ref)
    }
    val json = rows.map { case (n, f, r) =>
      f"""{"merges":$n,"fast_us_per_word":$f%.2f,"reference_us_per_word":$r%.2f}"""
    }.mkString("[", ",", "]")
    println(s"""{"probe":"bpe_encode","rows":$json}""")
  }
}
