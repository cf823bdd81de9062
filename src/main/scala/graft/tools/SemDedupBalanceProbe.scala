package graft.tools

import graft.Tables
import graft.llm.SimilarityApi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-balance probe for `llm_semdedup`'s trained codebook: the
  * within-cluster pair stage is quadratic IN THE LARGEST CLUSTER, so
  * the number that decides whether the per-cluster local-join design
  * survives a scale-up is max/mean cluster size under the trained
  * assignment — not corpus size. A balanced codebook keeps max/mean
  * near 1 and per-cluster work near (n/k)²; a collapsed one (every
  * vector in one cluster) silently reverts to the all-pairs product
  * the clustering exists to avoid.
  *
  * Replicates the embeddings with the SuiteScaleProbe mutation
  * (shifted ids, replica-seeded sign flips → cross-replica cosines
  * incoherent) and reports balance at 1× and N× under the SAME
  * training recipe the query uses (k=8, one Lloyd iteration,
  * roundDims=6).
  *
  * Usage: sbt "runMain graft.tools.SemDedupBalanceProbe [factor]"
  */
object SemDedupBalanceProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    val base = Tables.embeddings(spark, sf)
    def replicated(f: Int): DataFrame =
      (0 until f).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * 1_000_000L))
          .withColumn("embedding", expr(
            s"transform(embedding, (v, j) -> CASE WHEN pmod(hash(j, $i), 2) = 0" +
              " THEN v ELSE -v END)"))
      }.reduce(_ unionByName _)

    def report(tag: String, emb: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val codebook = SimilarityApi.kmeans(
        emb, "vec_id", "embedding", k = 8, iterations = 1, roundDims = 6)
      val sizes = SimilarityApi
        .assignClusters(emb, codebook, "vec_id", "embedding")
        .groupBy("cluster").count()
      val r = sizes.agg(
        count(lit(1)).as("k_live"), sum("count").as("n"),
        max("count").as("mx"), avg("count").as("mean")).head
      val secs = (System.nanoTime() - t0) / 1e9
      val ratio = r.getLong(2).toDouble / r.getDouble(3)
      println(f"semdedup-balance $tag%4s n=${r.getLong(1)}%8d " +
        f"k_live=${r.getLong(0)}%2d max=${r.getLong(2)}%8d " +
        f"mean=${r.getDouble(3)}%10.1f max/mean=$ratio%5.2f " +
        f"train+assign=$secs%6.2fs")
      assert(ratio < 4.0,
        s"cluster collapse: max/mean $ratio — the per-cluster pair stage " +
          "would degenerate toward all-pairs; raise k or re-examine init")
    }

    report("1x", base)
    report(s"${factor}x", replicated(factor))
    spark.stop()
  }
}
