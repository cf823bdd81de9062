package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Steady-state timing: run each query 3×, report the best of runs
  * 2–3 (after codegen/JIT/AQE warmup). This is the number comparable
  * to the single-query DuckDB oracle points in BASELINE.md; the
  * driver's graft.Bench intentionally measures cold single-shot times
  * (which include ~0.1–0.4 s of planning/JIT per query).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.SteadyBench [names...]"
  */
object SteadyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("agg_groupby", "join_inner_hash", "stream_tumbling",
        "llm_cosine_topk", "sql_tpch_q3", "join_asof", "topk_per_group")
    val results = names.map { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      n -> times.drop(1).min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"steady","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
