package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd primitives for the near-dup pipeline (SURVEY.md §2i).
  *
  * The LSH family needs tens of millions of tiny hash/compare ops per
  * batch; Spark's higher-order lambdas run them interpreted with
  * per-element allocation (measured 15–27 s per query at sf0.1).
  * These expressions do the same math as a tight generated loop.
  *
  * All mixing uses the public-domain splitmix64 finalizer, seeded per
  * slot — deterministic across runs/partitions, which the LSH banding
  * relies on.
  */
object HashUtil {
  /** splitmix64 finalizer (public domain, Steele et al.). */
  final def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  val MixBody: String =
    """private static long graftMix(long z) {
      |  z += 0x9e3779b97f4a7c15L;
      |  z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L;
      |  z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL;
      |  return z ^ (z >>> 31);
      |}""".stripMargin
}

/** MinHash signature: for each of `numHashes` slots i, the minimum of
  * splitmix64(elementHash + i) over the input hash array. One pass,
  * no allocation beyond the output array. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = HashUtil.mix(hs.getLong(j) + i)
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // addNewFunction may relocate the helper into a nested class when the
    // generated class splits — always call through the name it returns.
    val mix = ctx.addNewFunction("graftMix", HashUtil.MixBody)
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$numHashes];
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $best = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = $mix($hs.getLong($j) + $i);
         |    if ($v < $best) $best = $v;
         |  }
         |  $out[$i] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Weighted SimHash: 64-bit signature from an array of element hashes
  * (one per token occurrence — repeats weight the vote): bit b is set
  * iff more element hashes have bit b set than clear. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $hs.numElements();
         |int[] $counts = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Intersection size of two SORTED long arrays (two-pointer merge).
  * With |A∪B| = |A| + |B| − |A∩B| this gives exact Jaccard without
  * materializing intersection/union arrays — the hot inner op of the
  * pairwise verify stage. Inputs MUST be sorted ascending and
  * duplicate-free (sort_array(array_distinct(..))). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object TextHashFunctions {
  def ngramHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramHashes(exprOf(tokens), n))
  def minhashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(exprOf(hashes), numHashes))
  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(exprOf(hashes)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(exprOf(a), exprOf(b)))

  private def exprOf(c: Column): Expression =
    ColumnBridge.expression(org.apache.spark.sql.SparkSession.active, c)
}

/** Hashes of all word n-grams of a token array, in document order,
  * WITHOUT materializing shingle strings: each token is xxhash64'd
  * once, then n consecutive token hashes are combined with a
  * splitmix64 chain. Distinct shingles map to distinct hashes w.h.p.,
  * so Jaccard over these equals Jaccard over string shingles — at a
  * fraction of the cost (no per-shingle string allocation; measured
  * the dominant cost of the dedup family at sf0.1). */
case class NGramHashes(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = 0x51_7c_c1_b7_27_22_0a_95L
      var k = 0
      while (k < n) { h = HashUtil.mix(h + th(i + k)); k += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mix = ctx.addNewFunction("graftMix", HashUtil.MixBody)
    nullSafeCodeGen(ctx, ev, toks => {
      val m = ctx.freshName("m"); val th = ctx.freshName("th")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      s"""
         |int $m = $toks.numElements();
         |long[] $th = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $t = $toks.getUTF8String($i);
         |  $th[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
         |}
         |long[] $out = new long[$m < $n ? 0 : $m - $n + 1];
         |for (int $i = 0; $i + $n <= $m; $i++) {
         |  long $h = 0x517cc1b727220a95L;
         |  for (int $k = 0; $k < $n; $k++) { $h = $mix($h + $th[$i + $k]); }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
}
