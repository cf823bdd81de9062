package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to Spark's `private[sql]` plan → DataFrame constructor.
  *
  * The lake MERGE command carries the parsed SOURCE plan (a table,
  * view, or subquery) and must turn it into a DataFrame at execution
  * time; `Dataset.ofRows` is exactly that seam, and living in an
  * `org.apache.spark.sql` subpackage is the access path every Spark
  * extension library uses for it. Nothing else in this repo reaches
  * into Spark internals this way — keep it that way.
  */
object PlanBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Re-issue `df` as a STREAMING DataFrame (isStreaming = true) —
    * the contract a v1 `Source.getBatch` must satisfy
    * (MicroBatchExecution asserts it). This is how a v1 source built
    * on the engine's own readers (here: the lake change feed handing
    * each micro-batch to the parquet scan) marks its per-batch frame,
    * the same `internalCreateDataFrame` seam FileStreamSource uses
    * internally. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
