package graft.tools

import graft.llm.DedupApi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe for `llm_dup_clusters`' iterative connected
  * components: grow the pair graph 1× → 4× → 16× and measure total
  * wall time AND the number of label-propagation rounds.
  *
  * The 100 TB claim under test: min-label propagation costs one
  * (node,label) shuffle per ROUND, and rounds are O(max component
  * diameter) — a property of the dup-cluster STRUCTURE (chains of
  * near-dup revisions are short), not of corpus size. So 16× more
  * components must give ~constant rounds and near-linear total time;
  * if rounds grew with graph size the design would be wrong.
  *
  * The synthetic graph mirrors real dedup output: many small
  * components (paths of 2-7 nodes — diameters like near-dup revision
  * chains), disjoint across replicas, generated distributively via
  * sequence+explode (no driver materialization).
  *
  * Usage: sbt "runMain graft.tools.ClusterScaleProbe [maxFactor]"
  */
object ClusterScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxF = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val componentsPerReplica = 20000L

    /** Edge list: component `id` is a path of (id % 6) + 1 edges over
      * nodes id*8 + j — max diameter 6 hops at every factor. */
    def edges(f: Int): DataFrame =
      spark.range(f * componentsPerReplica)
        .select(col("id"), explode(expr("sequence(0, CAST(id % 6 AS INT))")).as("j"))
        .select((col("id") * 8 + col("j")).as("doc_a"),
          (col("id") * 8 + col("j") + 1).as("doc_b"))

    // warm the plan shapes once so factor-1 isn't charged codegen
    DedupApi.dupClustersWithRounds(edges(1), "doc_a", "doc_b")

    var f = 1
    while (f <= maxF) {
      val e = edges(f).cache()
      val nEdges = e.count()
      val t0 = System.nanoTime()
      val (labels, rounds) = DedupApi.dupClustersWithRounds(e, "doc_a", "doc_b")
      val nClusters = labels.select("cluster").distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"cc  f=$f%2d edges=$nEdges%8d clusters=$nClusters%8d " +
        f"rounds=$rounds%2d time=$secs%7.2fs per-round=${secs / rounds}%5.2fs " +
        f"throughput=${nEdges / secs}%9.0f edges/s")
      assert(nClusters == f * componentsPerReplica,
        s"CC miscounted components at f=$f")
      e.unpersist()
      f *= 4
    }
    spark.stop()
  }
}
