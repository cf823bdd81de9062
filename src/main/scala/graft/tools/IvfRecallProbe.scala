package graft.tools

import graft.Tables
import graft.llm.SimilarityApi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF RECALL CURVE probe (r16, the r15 verdict's evidence gap #4):
  * the quality side of the `llm_ann_ivf` index's speed/recall
  * tradeoff, measured — recall@10 of the IVF probe vs brute-force
  * cosine top-10 as nProbe sweeps 1 → 2 → 4 → 8 over the 8-cluster
  * codebook the declared query uses, on the sf0.1 embeddings (~2000
  * vectors, ~50 query points sampled deterministically).
  *
  * Why it matters at 100 TB: nProbe is the knob that trades scanned
  * fraction (~nProbe/#clusters of the corpus) for recall; an index
  * whose recall curve was never measured is a guess, not a contract.
  * nProbe = #clusters must give recall 1.0 by construction (every
  * bucket scanned — a probe of the probe). LlmSpec pins the curve as
  * an assertion (recall@4 ≥ 0.9, monotone, exact at 8); this tool
  * prints the measured row for BASELINE.md.
  */
object IvfRecallProbe {

  /** recall@k per nProbe over a TRAINED 8-cluster codebook (5 Lloyd
    * iterations — the first curve, measured with arbitrary vectors as
    * centroids, topped out at 0.68@nProbe=4: codebook quality is the
    * index, so the contract is pinned on the trained one). */
  def recallCurve(emb: DataFrame, k: Int,
      nProbes: Seq[Int]): Seq[(Int, Double)] = {
    val cent = SimilarityApi
      .trainCentroids(emb, "vec_id", "embedding", k = 8, iters = 5)
      .persist()
    val queries = emb.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val assigned = SimilarityApi
      .assignClusters(emb, cent, "vec_id", "embedding").persist()
    val bruteW = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val brute = emb.crossJoin(broadcast(queries))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.dotProduct(
          col("embedding"), col("q_emb")), 6))
      .withColumn("__rk", row_number().over(bruteW))
      .filter(col("__rk") <= k)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val curve = nProbes.map { np =>
      val ivf = SimilarityApi.ivfTopKBatch(assigned, cent, queries,
          "vec_id", "embedding", k, np)
        .select(col("q_id"), col("nbr_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = brute.map { case (q, want) =>
        want.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / want.size
      }
      (np, recalls.sum / recalls.size)
    }
    assigned.unpersist()
    cent.unpersist()
    curve
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val nQ = emb.filter(col("vec_id") % 40 === 0).count()
    val curve = recallCurve(emb, k = 10, nProbes = Seq(1, 2, 4, 8))
    val rows = curve.map { case (np, r) =>
      f"""{"nProbe":$np,"recall_at_10":$r%.4f}""" }.mkString("[", ",", "]")
    println(s"""{"probe":"ivf_recall","sf":"$sfDir","n_queries":$nQ,""" +
      s""""n_clusters":8,"rows":$rows}""")
    spark.stop()
  }
}
