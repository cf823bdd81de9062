package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two float-vector columns.
  *
  * This is the hot inner loop of every similarity-search operator
  * (SURVEY.md §2i): at 100 TB / billions of vectors the higher-order
  * function version (`aggregate(zip_with(..))`) stays interpreted and
  * allocates per row, while this expression participates in whole-stage
  * codegen — a tight primitive loop over the two ArrayData buffers with
  * zero allocation.
  *
  * Summation is a strict left-to-right double fold (each float cast to
  * double first), which makes results bit-identical to the DuckDB
  * oracle formula
  * `list_aggregate(list_transform(generate_series(1,n), i -> CAST(a[i] AS DOUBLE)*CAST(b[i] AS DOUBLE)), 'sum')`
  * and to Spark's own `aggregate()` fold — so oracle checks are exact,
  * not tolerance-based.
  *
  * The test-data embeddings are L2-normalized (verified: norm == 1.0),
  * so dot == cosine similarity for them; [[CosineSimilarity]] divides
  * by norms for the general case.
  *
  * Mismatched vector lengths fold over the common prefix
  * (min(len(a), len(b))) rather than erroring — matching the DuckDB
  * oracle formula, which iterates generate_series(1, len(a)). Callers
  * that need strict dimensional agreement should validate upstream
  * (all shipped tables are fixed-width).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity = dot(a,b) / (||a|| * ||b||), same codegen design
  * as [[DotProduct]]; norms computed in the same pass over the buffers. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry points. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(exprOf(a), exprOf(b)))
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(exprOf(a), exprOf(b)))

  private def exprOf(c: Column): Expression = {
    val spark = org.apache.spark.sql.SparkSession.active
    ColumnBridge.expression(spark, c)
  }

  /** Make both expressions usable from SQL strings (`expr(...)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "dot_product",
      es => DotProduct(es.head, es(1)))
    ColumnBridge.registerFunction(spark, "cosine_similarity",
      es => CosineSimilarity(es.head, es(1)))
  }
}
