package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Round-18 deliverable generator: writes
  * `<outdir>/<query>_<suffix>.txt` holding the `explain("formatted")`
  * of EVERY action the named query executes — not just the returned
  * DataFrame's plan. For the lake DML verbs (whose cost is the
  * sequence of driver actions, not one plan) this is the artifact
  * that shows the round-18 observed-write fusion: gates/stats/row
  * counts riding the single write action as a `CollectMetrics` node
  * instead of separate aggregate actions.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=8 \
  *     sbt "runMain graft.tools.PlanDump plans/r18 after sink_lake_merge ..."
  *
  * The listener fires on each batch action (count/collect/write and
  * the inner actions of foreachBatch micro-batches), so streaming
  * sinks contribute their per-trigger plans in execution order.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outdir> <suffix> <query> [query ...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val captured = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val plan =
          try qe.explainString(org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"<explain failed: ${e.getMessage}>" }
        captured.add((funcName, plan))
      }
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      captured.clear()
      val df = fn(spark, sfDir)
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val n = df.count()
      // listener delivery is async on the listener bus
      Thread.sleep(1500)
      import scala.jdk.CollectionConverters._
      val sb = new StringBuilder
      sb.append(s"# $name @ $suffix — every action's explain(formatted), in execution order\n")
      sb.append(s"# sfDir=$sfDir rows_returned=$n actions_captured=${captured.size}\n\n")
      captured.asScala.zipWithIndex.foreach { case ((fname, plan), i) =>
        sb.append(s"========== action ${i + 1}/${captured.size} ($fname) ==========\n")
        sb.append(plan).append("\n\n")
      }
      sb.append("========== returned DataFrame (pre-action plan) ==========\n")
      sb.append(finalPlan).append("\n")
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${name}_$suffix.txt (${captured.size} actions)")
    }
    spark.stop()
  }
}
