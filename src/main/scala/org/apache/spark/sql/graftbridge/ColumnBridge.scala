package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column/Expression seam.
  *
  * Spark 4 wraps Columns in ColumnNodes (the Connect refactor), so a
  * library-defined Catalyst `Expression` needs `classic.ExpressionUtils`
  * to become a usable `Column`. Placing this one-file shim inside an
  * `org.apache.spark.sql` subpackage is the standard technique used by
  * open-source Spark extension libraries to reach that seam; everything
  * here delegates to Spark's own public-source internals.
  */
object ColumnBridge {
  /** Wrap a raw Catalyst expression as a DataFrame Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression (classic mode). */
  def expression(spark: SparkSession, c: Column): Expression =
    ExpressionUtils.expression(c)

  /** Unwrap without a session (classic-mode Columns carry their
    * expression; the session parameter above is vestigial). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression builder as a SQL-callable function for this
    * session, so `expr("name(...)")` resolves to a native (codegen'd)
    * Catalyst expression rather than a black-box UDF. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
