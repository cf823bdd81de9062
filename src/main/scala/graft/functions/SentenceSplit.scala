package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator`: split a text column into sentences,
  * one output row per sentence with its 0-based ordinal — the UDTF
  * seam (SURVEY.md §2g) done natively instead of via
  * `flatMap`/UDF+explode.
  *
  * Implements [[CollectionGenerator]], the contract `GenerateExec`'s
  * whole-stage-codegen path requires: [[doGenCode]] emits the sentence
  * collection via a single static call and GenerateExec generates the
  * row-expansion loop around it (`position = true` makes the loop
  * index the `pos` column) — so the operator runs inside the codegen
  * span with no interpreted `eval` per row, unlike a UDF returning an
  * array (serialization per call) or an RDD `flatMap` (breaks the
  * whole plan out of codegen and Catalyst's sight).
  *
  * Sentence boundary: a run of one or more of `. ! ?` followed by a
  * run of one or more whitespace chars (space/tab/newline/CR). The
  * delimiter run is dropped, a trailing fragment keeps its
  * punctuation, empty fragments are dropped — exactly the semantics of
  * `regexp_split_to_array(text, '[.!?]+[ \t\n\r]+')` + empty filter,
  * which is what the DuckDB oracle runs (leftmost-match equivalence
  * argued case-by-case in the scan loop; property-tested against
  * `java.util.regex` split in FunctionsSpec).
  */
case class SentenceSplit(child: Expression)
    extends UnaryExpression with CollectionGenerator {

  override def position: Boolean = true
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(StringType, containsNull = false)
  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("sentence", StringType, nullable = false)
  override def prettyName: String = "split_sentences"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"split_sentences requires a string column, got ${other.catalogString}")
  }

  /** Interpreted path (non-codegen fallback): same static splitter. */
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val parts = SentenceSplit.split(v.asInstanceOf[UTF8String])
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < parts.length
        override def next(): InternalRow = {
          val r = InternalRow(i, parts(i)); i += 1; r
        }
      }
    }
  }

  /** Codegen path: GenerateExec asks this expression for the
    * collection and emits the expansion loop itself. `Generator`s are
    * declared non-nullable, so `nullSafeCodeGen` emits no null guard —
    * the static seam itself maps a null input to an empty collection
    * (zero output rows, same as the interpreted path). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SentenceSplit.splitToArrayData($c);")

  override protected def withNewChildInternal(newChild: Expression): SentenceSplit =
    copy(child = newChild)
}

object SentenceSplit {

  /** Column-level entry point (the `posexplode(...)`-style API). */
  def splitSentences(text: Column): Column =
    ColumnBridge.column(SentenceSplit(ColumnBridge.expression(text)))

  @inline private def isPunct(c: Char): Boolean = c == '.' || c == '!' || c == '?'
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Single-pass scan, no regex engine, no allocation beyond the
    * output fragments. Mirrors leftmost-first matching of
    * `[.!?]+[ \t\n\r]+`: a punct run NOT followed by whitespace can
    * never begin a match (any suffix of the run fails the same way),
    * so skipping the whole run preserves regex semantics. */
  def split(s: UTF8String): Array[UTF8String] = {
    val str = s.toString
    val n = str.length
    val out = Array.newBuilder[UTF8String]
    var start = 0
    var i = 0
    while (i < n) {
      if (isPunct(str.charAt(i))) {
        var j = i
        while (j < n && isPunct(str.charAt(j))) j += 1
        var k = j
        while (k < n && isWs(str.charAt(k))) k += 1
        if (k > j) { // boundary: punct run + whitespace run
          if (i > start) out += UTF8String.fromString(str.substring(start, i))
          start = k
          i = k
        } else {
          i = j
        }
      } else {
        i += 1
      }
    }
    if (start < n) out += UTF8String.fromString(str.substring(start, n))
    out.result()
  }

  private val emptyArray = new GenericArrayData(Array.empty[Any])

  /** Static seam the generated code calls; null-tolerant because the
    * generator contract is non-nullable (null text → zero rows). */
  def splitToArrayData(s: UTF8String): ArrayData =
    if (s == null) emptyArray
    else new GenericArrayData(split(s).asInstanceOf[Array[Any]])
}
