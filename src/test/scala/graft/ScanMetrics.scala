package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared layout-spec helper: rows emitted by the parquet scan node(s)
  * after executing `df` — the "rows decoded from disk" proxy the
  * data-layout specs assert on (row-group-level pushdown happens below
  * the scan; the residual filter above it). AQE wraps materialized
  * stages in QueryStageExec nodes whose `children` is Nil, so a plain
  * `collect` never reaches the scan — recurse through stage/adaptive
  * wrappers explicitly. */
object ScanMetrics {
  def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[Long] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s.metrics("numOutputRows").value)
      case other => other.children.flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.nonEmpty, "no FileSourceScanExec in executed plan")
    found.sum
  }
}
