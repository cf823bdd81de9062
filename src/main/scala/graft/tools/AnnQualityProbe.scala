package graft.tools

import graft.Tables
import graft.llm.SimilarityApi
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN QUALITY curve: recall@10 of the IVF index versus the probe
  * fraction — the accuracy/cost dial an embedding-retrieval deployment
  * actually tunes. Ground truth is the exact brute-force top-10 per
  * query over the full corpus (fine at probe scale; the 100 TB path
  * never runs it — that is the point of the index).
  *
  * Expectations asserted, not just printed: recall must be monotone
  * non-decreasing in nProbe (more clusters scanned can only add
  * candidates) and exactly 1.0 at the full probe (scanning every
  * cluster IS brute force, modulo identical tie-breaking — both sides
  * rank by (sim desc, id asc)).
  *
  * Usage: sbt "runMain graft.tools.AnnQualityProbe [k]"
  */
object AnnQualityProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions.dotProduct

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val nClusters = 8
    val queries = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val nQueries = queries.count()

    // exact ground truth: every query scores the whole corpus
    val truth = emb.crossJoin(broadcast(queries))
      .withColumn("sim", round(dotProduct(col("embedding"), col("q_emb")), 6))
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id").as("t_id"))
      .persist()
    require(truth.count() == nQueries * k, "ground truth is not n x k")

    println(f"corpus=${emb.count()} queries=$nQueries k=$k clusters=$nClusters")

    // two codebooks: the declared query's fixed one (vectors 1..8 —
    // no training, a degenerate codebook) and a kmeans-trained one —
    // the curve separation measures what codebook QUALITY buys
    def curve(label: String, cents: org.apache.spark.sql.DataFrame): Unit = {
      val assigned = SimilarityApi
        .assignClusters(emb, cents, "vec_id", "embedding").persist()
      assigned.count()
      var prev = -1.0
      (1 to nClusters).foreach { nProbe =>
        val got = SimilarityApi.ivfTopKBatch(
          assigned, cents, queries, "vec_id", "embedding", k, nProbe)
        val hits = got.select(col("q_id"), col("nbr_id").as("t_id"))
          .join(truth, Seq("q_id", "t_id")).count()
        val recall = hits.toDouble / (nQueries * k)
        println(f"$label%-8s nProbe=$nProbe  " +
          f"probe_fraction=${nProbe.toDouble / nClusters}%.3f" +
          f"  recall@$k=$recall%.4f")
        require(recall + 1e-12 >= prev,
          f"recall NOT monotone: $recall%.4f after $prev%.4f at nProbe=$nProbe")
        prev = recall
        if (nProbe == nClusters) require(recall == 1.0,
          f"full probe must reproduce brute force exactly, got $recall%.6f")
      }
      assigned.unpersist()
      ()
    }
    curve("fixed", emb.filter(col("vec_id").between(1, nClusters))
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb")))
    curve("kmeans", SimilarityApi.kmeans(
      emb, "vec_id", "embedding", nClusters, iterations = 10))
    spark.stop()
  }
}
