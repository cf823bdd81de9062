package graft.llm

import graft.functions.VectorFunctions.dotProduct
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public similarity-search API over embedding columns (float-array).
  * The `llm_cosine_topk` / `llm_ann_ivf` / `llm_embed_neardup` queries
  * are instantiations of these.
  */
object SimilarityApi {

  /** Brute-force top-K by dot product against one query vector
    * (`query` must be a single row with column `q_emb`). Broadcast +
    * codegen scan + TakeOrderedAndProject: the correctness baseline. */
  def topK(emb: DataFrame, query: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame =
    emb.crossJoin(broadcast(query))
      .select(col(idCol),
        round(dotProduct(col(embCol), col("q_emb")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)

  /** Assign every vector to its nearest centroid (IVF coarse
    * quantization). `centroids` carries (c_id, c_emb); it is broadcast,
    * so assignment is a single codegen scan of the corpus. */
  def assignClusters(emb: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("__d", dotProduct(col(embCol), col("c_emb")))
      .groupBy(idCol)
      .agg(max(struct(col("__d"), (-col("c_id")).as("__negc"),
        col(embCol).as("__e"))).as("m"))
      .select(col(idCol), (-col("m.__negc")).as("cluster"),
        col("m.__e").as(embCol))

  /** IVF probe: top-K among vectors assigned to the nProbe clusters
    * nearest the query — scans a fraction of the corpus. */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, query: DataFrame,
      idCol: String, embCol: String, k: Int, nProbe: Int): DataFrame = {
    val probed = centroids.crossJoin(broadcast(query))
      .withColumn("__qd", dotProduct(col("c_emb"), col("q_emb")))
      .orderBy(col("__qd").desc, col("c_id").asc)
      .limit(nProbe)
      .select(col("c_id"))
    assigned
      .join(broadcast(probed), assigned("cluster") === probed("c_id"))
      .crossJoin(broadcast(query))
      .select(col(idCol), col("cluster"),
        round(dotProduct(col(embCol), col("q_emb")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact nearest neighbor for every vector (embedding-cosine
    * near-dup): partial-aggregatable argmax, no sort of the pair
    * space. Quadratic in corpus size — the bounded-scale baseline the
    * IVF path approximates. */
  def nearestNeighbor(emb: DataFrame, idCol: String, embCol: String): DataFrame = {
    val a = emb.select(col(idCol).as("a_id"), col(embCol).as("a_emb"))
    val b = emb.select(col(idCol).as("b_id"), col(embCol).as("b_emb"))
    a.crossJoin(broadcast(b))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("__s", dotProduct(col("a_emb"), col("b_emb")))
      .groupBy("a_id")
      .agg(max(struct(col("__s"), (-col("b_id")).as("__negb"))).as("m"))
      .select(col("a_id"), (-col("m.__negb")).as("nbr_id"),
        round(col("m.__s"), 6).as("sim"))
  }

  /** Per-group centroids (mean vector by dimension): the k-means /
    * IVF codebook-training step. Shuffles scalar partials only. */
  def centroids(emb: DataFrame, groupCol: String, embCol: String): DataFrame =
    emb.select(col(groupCol), posexplode(col(embCol)))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").cast("double").as("__v"))
      .groupBy(groupCol, "pos")
      .agg(avg("__v").as("dim_avg"), count(lit(1)).as("n"))
}
