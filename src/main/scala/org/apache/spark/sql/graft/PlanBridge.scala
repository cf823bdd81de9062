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
}
