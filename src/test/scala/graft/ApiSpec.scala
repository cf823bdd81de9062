package graft

import graft.llm.{DedupApi, SimilarityApi}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public library API on ARBITRARY user DataFrames (not the test
  * tables) — proving the surface composes outside the declared
  * queries — plus equivalence with the declared query pipelines. */
class ApiSpec extends AnyFunSuite with SparkFixture {

  test("DedupApi.exactDedup on a user DataFrame") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox"), (2L, "THE QUICK BROWN FOX  "),
      (3L, "something else")).toDF("id", "body")
    val got = DedupApi.exactDedup(df, "id", "body")
      .orderBy("keep_id").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 2L) // keeper 1, 2 copies
  }

  test("DedupApi minhash pipeline finds the planted pair on user data") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 39).map(i => s"tok$i").mkString(" ")
    val far = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "body")
    val sh = DedupApi.withHashedShingles(
      DedupApi.withShingles(df, "body"), "sh")
    val cands = DedupApi.minhashCandidates(sh, "id", "shs")
    val pairs = DedupApi.verifyPairs(cands, sh, "id", "shs", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("DedupApi.jaccard is exact on known sets") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L, 6L))).toDF("a", "b")
    val j = df.select(DedupApi.jaccard(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(j == 2.0 / 6.0)
  }

  test("DedupApi.simhash pipeline flags near pairs on user data") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 59).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, near)).toDF("id", "body")
    val sigs = DedupApi.simhashSignatures(df, "body")
    val pairs = DedupApi.simhashNearPairs(sigs, "id", "sim", maxHamming = 7,
      blocks = 16)
      .collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 1L)
  }

  test("SimilarityApi banded near-dup pipeline on user vectors") {
    import spark.implicits._
    // two near-identical vectors (sim ≈ 1), one orthogonal-ish — on
    // 8 planes split 2 bands × 4 bits the near pair must collide in
    // every band; verify keeps exactly it
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val dim = 8
    val a = unit(Array.fill(dim)(1.0f))
    val b = unit(Array.tabulate(dim)(i => if (i == 0) 1.05f else 1.0f))
    val c = unit(Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f))
    val emb = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "emb")
    val planes = Seq.tabulate(8) { p =>
      (p.toLong, unit(Array.tabulate(dim)(i =>
        if ((i + p) % 3 == 0) 1.0f else if ((i * p) % 2 == 0) -0.5f else 0.25f)))
    }.toDF("p_id", "p_emb")
    val sigs = SimilarityApi.signBandSignatures(emb, planes, "id", "emb", bandBits = 4)
    assert(sigs.count() == 6) // 3 vectors × 2 bands
    val cand = SimilarityApi.bandedCandidates(sigs, "id")
    val pairs = SimilarityApi.verifyPairs(emb, cand, "id", "emb", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)), s"got ${pairs.toSeq}")
  }

  test("DedupApi.dupClusters composes with minhash pairs on user data") {
    import spark.implicits._
    // three mutually-near docs (chain via pairwise overlap) + one far
    val d1 = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d2 = (1 to 39).map(i => s"tok$i").mkString(" ")
    val d3 = (2 to 40).map(i => s"tok$i").mkString(" ")
    val far = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3), (9L, far)).toDF("id", "body")
    val sh = DedupApi.withHashedShingles(DedupApi.withShingles(df, "body"), "sh")
    val pairs = DedupApi.verifyPairs(
      DedupApi.minhashCandidates(sh, "id", "shs"), sh, "id", "shs", 0.5)
    val clusters = DedupApi.dupClusters(pairs, "id_a", "id_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"near trio must form one cluster: $clusters")
  }

  test("SimilarityApi.topK equals the declared llm_cosine_topk query") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val api = SimilarityApi.topK(
      emb.filter(col("vec_id") =!= 0), q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val query = SparkEntry.queries("llm_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(api.toSeq == query.toSeq)
  }

  test("SimilarityApi IVF probe results are a subset of brute-force order") {
    val emb = Tables.embeddings(spark, sfDir)
    val cent = emb.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val assigned = SimilarityApi.assignClusters(emb, cent, "vec_id", "embedding")
    assert(assigned.count() == emb.count()) // every vector assigned exactly once
    val ivf = SimilarityApi.ivfTopK(
      assigned.filter(col("vec_id") =!= 0), cent, q, "vec_id", "embedding",
      k = 5, nProbe = 2).collect()
    assert(ivf.length == 5)
    // scores must be genuine dot products: within [-1, 1] for unit vectors
    assert(ivf.forall(r => math.abs(r.getDouble(2)) <= 1.0001))
  }

  test("SimilarityApi.nearestNeighbor equals the declared query") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val api = SimilarityApi.nearestNeighbor(emb, "vec_id", "embedding")
      .orderBy("a_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // reference: per-vector argmax via window
    import org.apache.spark.sql.expressions.Window
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val w = Window.partitionBy("a_id").orderBy(col("s").desc, col("b_id").asc)
    val ref = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
      .withColumn("s", graft.functions.VectorFunctions.dotProduct(col("a_emb"), col("b_emb")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("a_id", "b_id")
      .orderBy("a_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(api.toSeq == ref.toSeq)
    // the size cap refuses to launch the O(n²) product past maxRows
    intercept[IllegalArgumentException] {
      SimilarityApi.nearestNeighbor(emb, "vec_id", "embedding", maxRows = 50)
    }
  }

  test("SimilarityApi.kmeans improves the spherical objective over random codebook") {
    val emb = Tables.embeddings(spark, sfDir)
    val init = emb.orderBy(col("vec_id").asc).limit(8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val before = SimilarityApi.inertia(emb, init, "vec_id", "embedding")
    val trained = SimilarityApi.kmeans(emb, "vec_id", "embedding", k = 8,
      iterations = 2)
    assert(trained.count() <= 8 && trained.count() >= 1)
    val after = SimilarityApi.inertia(emb, trained, "vec_id", "embedding")
    assert(after > before,
      f"training did not improve objective: before=$before%.4f after=$after%.4f")
    // trained centroids are unit-normalized (spherical step)
    val norms = trained.select(
      expr("sqrt(aggregate(transform(c_emb, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a,v) -> a+v))"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
  }

  test("SimilarityApi.kmeans is deterministic across runs") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    def run() = SimilarityApi.kmeans(emb, "vec_id", "embedding", 4, 2)
      .orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
    assert(run().toSeq == run().toSeq)
  }

  test("incremental ledger: dedup statuses + append-back idempotence") {
    import spark.implicits._
    import graft.Scratch.tmpPathRaw
    val prior = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")).toDF("id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy of 1
      (11L, "one two three four five six seven eight"),       // near copy of 2
      (12L, "totally different words sharing no grams with anything prior"))
      .toDF("id", "text")
    val tag = "graft_ledger_api_test"
    Seq(tag + "_dig", tag + "_fp", tag + "_set", tag + "_batch_dig")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (dig, fp, sets) =
      DedupApi.writeLedger(prior, "id", "text", tag, tmpPathRaw)
    val st1 = DedupApi.dedupAgainstLedger(batch, "id", "text",
      dig, fp, sets, tag, tmpPathRaw)
    val got1 = st1.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got1 == Seq((10L, "dup_exact", 1L), (11L, "dup_near", 2L),
      (12L, "new", -1L)))
    // append the accepted doc's keys; re-ingesting the SAME batch must
    // now flag every doc as a duplicate (idempotent re-ingest)
    DedupApi.appendToLedger(batch, "id", "text", st1, dig, fp, sets)
    val got2 = DedupApi.dedupAgainstLedger(batch, "id", "text",
        dig, fp, sets, tag, tmpPathRaw)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got2 == Seq((10L, "dup_exact", 1L), (11L, "dup_near", 2L),
      (12L, "dup_exact", 12L)))
  }

  test("vector ledger: batch dedup against persisted signatures") {
    import spark.implicits._
    import graft.Scratch.tmpPathRaw
    val e1 = Array(1f, 0f, 0f, 0f); val e2 = Array(0f, 1f, 0f, 0f)
    val e3 = Array(0f, 0f, 1f, 0f)
    val prior = Seq((1L, e1), (2L, e2), (3L, e3)).toDF("id", "emb")
    val planes = Seq(
      (0L, Array(1f, 1f, 0f, 0f)), (1L, Array(1f, -1f, 0f, 0f)),
      (2L, Array(0f, 1f, 1f, 0f)), (3L, Array(0f, 1f, -1f, 0f)),
      (4L, Array(1f, 0f, 1f, 0f)), (5L, Array(1f, 0f, -1f, 0f)),
      (6L, Array(1f, 1f, 1f, 0f)), (7L, Array(-1f, 1f, 1f, 0f)))
      .toDF("p_id", "p_emb")
    val tag = "graft_vledger_api_test"
    Seq(tag + "_sig", tag + "_vec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (sigTab, vecTab) = SimilarityApi.writeVectorLedger(
      prior, planes, "id", "emb", bandBits = 4, tag, tmpPathRaw)
    val batch = Seq((10L, e1), (11L, e2.map(-_))).toDF("id", "emb")
    val got = SimilarityApi.dedupAgainstVectorLedger(batch, planes,
        "id", "emb", sigTab, vecTab, tau = 0.9, bandBits = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((10L, "dup", 1L), (11L, "new", -1L)))
  }

  test("SimilarityApi.centroids: centroid of identical vectors is the vector") {
    import spark.implicits._
    val v = Array(0.5f, -0.25f, 0.75f)
    val df = Seq((1L, 0, v), (2L, 0, v), (3L, 1, Array(1.0f, 0.0f, 0.0f)))
      .toDF("id", "label", "emb")
    val got = SimilarityApi.centroids(df, "label", "emb")
      .orderBy("label", "pos").collect()
    assert(got.length == 6)
    assert(got(0).getDouble(2) == 0.5 && got(1).getDouble(2) == -0.25)
    assert(got(3).getDouble(2) == 1.0)
  }
}
