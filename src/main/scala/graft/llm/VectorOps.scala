package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions.dotProduct
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY.md §2i).
  *
  * All similarity math runs through the codegen'd [[graft.functions.DotProduct]]
  * expression (embeddings are L2-normalized, verified, so dot ==
  * cosine). The DuckDB oracle reproduces the identical left-to-right
  * double fold (`list_aggregate(list_transform(generate_series(..)))`)
  * so scores are bit-exact across engines and top-K selection (ordered
  * by score with id tiebreak) is deterministic — no tolerance games.
  *
  * Scale story: brute-force top-K is the correctness baseline (fine
  * when one side is a single query vector — it is a broadcast + scan);
  * `llm_ann_ivf` is the 100 TB path: coarse-quantize every vector to
  * its nearest centroid once (centroid set broadcast), then probe only
  * the nProbe closest clusters at query time, scanning a fraction of
  * the corpus.
  */
object VectorOps {

  /** Oracle-side dot product, bit-identical to DotProduct's fold. */
  private def sqlDot(a: String, b: String): String =
    s"""list_aggregate(list_transform(generate_series(1, len($a)),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')""".stripMargin

  /** Oracle-side sign-LSH band bucket — Spark's `xxhash64(band,
    * packed)` (seed 42, children folded left-to-right through
    * XXH64.hashLong) replayed bit-for-bit via [[DuckHash]]. Mirrors
    * [[SimilarityApi.signBandSignatures]]'s 64-bit band-bucket hash. */
  private def bucketHashSql(band: String, packed: String): String =
    DuckHash.hashLongSigned(packed, DuckHash.hashLongSigned(band, "42"))

  /** Brute-force cosine top-10 for a fixed query vector (vec_id 0):
    * broadcast the query, one codegen scan, TakeOrderedAndProject. */
  private val cosineTopk = QueryDef(
    "llm_cosine_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(
          col("vec_id"), col("label"),
          round(dotProduct(col("embedding"), col("q_emb")), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
    },
    Some(s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
             SELECT vec_id, label,
               round(${sqlDot("embedding", "q_emb")}, 6) AS sim
             FROM embeddings CROSS JOIN q
             WHERE vec_id <> 0
             ORDER BY sim DESC, vec_id ASC LIMIT 10"""))

  /** IVF-style ANN over a PERSISTED index: coarse-quantize to 8
    * centroids (vectors 1..8 as a deterministic codebook), persist the
    * codebook + cluster-bucketed assignments via
    * [[SimilarityApi.writeIvfIndex]], then probe the 2 clusters
    * nearest the query with exact top-5 inside — the probe reads the
    * assignment table and recomputes NOTHING (no aggregate in the
    * probe plan, asserted in ScaleDesignSpec). This is
    * pay-the-shuffle-once applied to vectors: at 100 TB the index is
    * built per corpus snapshot and amortized over every query, and
    * cluster-bucketing means a probe touches only nProbe buckets'
    * files. The index build is memoized per (session, sfDir) to model
    * exactly that amortization — the query (and its bench timing)
    * measures the recurring probe cost. */
  private val ivfIndexBuilt = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, String)]()

  private val annIvf = QueryDef(
    "llm_ann_ivf",
    (s, d) => {
      import graft.Scratch.{runTag, tmpPathRaw}
      val emb = Tables.embeddings(s, d)
      val cent = emb.filter(col("vec_id").between(1, 8))
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val tag = "graft_ivf_" + runTag(d)
      val (cbTab, asgTab) = ivfIndexBuilt.computeIfAbsent((s, d), _ =>
        SimilarityApi.writeIvfIndex(
          emb, cent, "vec_id", "embedding", tag, tmpPathRaw))
      SimilarityApi.ivfTopK(
          s.table(asgTab).filter(col("vec_id") =!= 0), s.table(cbTab),
          q, "vec_id", "embedding", k = 5, nProbe = 2)
    },
    Some(s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
             cent AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
                      WHERE vec_id BETWEEN 1 AND 8),
             scored AS (
               SELECT e.vec_id, e.embedding, c.c_id,
                 ${sqlDot("e.embedding", "c.c_emb")} AS cdot
               FROM embeddings e CROSS JOIN cent c),
             asg AS (
               SELECT vec_id, embedding, c_id AS cluster FROM (
                 SELECT vec_id, embedding, c_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cdot DESC, c_id ASC) AS rn
                 FROM scored)
               WHERE rn = 1),
             probe AS (
               SELECT c_id FROM (
                 SELECT c.c_id, ${sqlDot("c.c_emb", "q.q_emb")} AS qdot
                 FROM cent c CROSS JOIN q)
               ORDER BY qdot DESC, c_id ASC LIMIT 2)
             SELECT a.vec_id, a.cluster,
               round(${sqlDot("a.embedding", "q.q_emb")}, 6) AS sim
             FROM asg a JOIN probe p ON a.cluster = p.c_id CROSS JOIN q
             WHERE a.vec_id <> 0
             ORDER BY sim DESC, a.vec_id ASC LIMIT 5"""))

  /** Embedding-cosine near-dup: exact nearest neighbor for each vector
    * (brute force — the correctness baseline the banded/IVF paths are
    * judged against). Delegates to [[SimilarityApi.nearestNeighbor]],
    * which hard-caps the input size: the O(n²) broadcast product is a
    * bounded-scale baseline by contract and cannot be launched on a
    * corpus-scale input by accident. */
  private val embedNearDup = QueryDef(
    "llm_embed_neardup",
    (s, d) =>
      SimilarityApi
        .nearestNeighbor(Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy("a_id"),
    Some(s"""SELECT a_id, nbr_id, sim FROM (
               SELECT a.vec_id AS a_id, b.vec_id AS nbr_id,
                 round(${sqlDot("a.embedding", "b.embedding")}, 6) AS sim,
                 row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY ${sqlDot("a.embedding", "b.embedding")} DESC,
                            b.vec_id ASC) AS rn
               FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
             WHERE rn = 1 ORDER BY a_id"""))

  /** Corpus count for the adaptive band-width decision, read FRESH on
    * every call from the parquet footers (a footer holds the exact row
    * count; no data pages are touched, so this is milliseconds even at
    * 100 TB file counts that matter here — one footer per file).
    *
    * Deliberately NOT memoized: a (session, dir) cache pins
    * SparkSession references for the process lifetime, and if data
    * under a previously-counted dir is regenerated in-session (the
    * scale-probe/scratch pattern) a stale count silently picks the
    * wrong band width while the DuckDB oracle computes count(*) fresh
    * — a hash mismatch with no error. */
  private def embeddingsCount(s: SparkSession, d: String): Long = {
    val conf = s.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).filter(_.getPath.getName.endsWith(".parquet"))
      else Array(fs.getFileStatus(root))
    files.map { st =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try rdr.getRecordCount finally rdr.close()
    }.sum
  }

  /** BANDED all-pairs embedding near-dup — the scale path that
    * replaces [[embedNearDup]]'s O(n²) product: sign-LSH hyperplanes
    * (embedding vectors 10..10+4b−1, 0-based plane ids) split into 4
    * bands × b bits; candidates = pairs sharing any band bucket
    * (equi-join, O(corpus + collisions)); exact dot-product
    * verification on candidates only, keep rounded sim ≥ 0.35.
    *
    * The band width b is CORPUS-SIZE-ADAPTIVE
    * ([[SimilarityApi.adaptiveBandBits]]: ~log₂(n)−8, floor 4, NO
    * ceiling) — a fixed b leaves a ~n²/2^b collision fraction that
    * goes quadratic at scale (SuiteScaleProbe measured exactly that at
    * a 10× corpus before this change), and the old 16-bit CEILING
    * reinstated the same failure past ~10⁷ vectors; now the bucket is
    * xxhash64(band, packed-signature) — the full band signature hashed
    * into 64-bit bucket space, the MinHash banding pattern — so
    * nothing caps the width and per-band collisions stay ~linear at
    * any n (BandScaleProbe measures fixed-vs-adaptive directly).
    * Every driver SF lands on the floor b=4 (the historical config);
    * the DuckDB oracle computes b from count(*) with the identical
    * GREATEST/ceil(log2) formula and replays the XXH64.hashLong chain
    * bit-for-bit (DuckHash), so the query stays hash-exact at ANY
    * scale. The candidate join carries [[SimilarityApi.bandedCandidates]]'s
    * fail-loud bucket-skew guard.
    *
    * Geometry: P[band collision] = (1-θ/π)ᵇ, so at sim 0.9 recall is
    * ~99.9% (b=4) with ~0.2% of pairs examined; this corpus is
    * near-random unit vectors (max pair sim 0.48 — an adversarial
    * worst case for LSH), so the measured recall/candidate numbers in
    * LlmSpec are the honest floor, not the typical case. All bucket
    * arithmetic is the bit-exact dot fold → hash-exact DuckDB oracle,
    * like `llm_ann_lsh`. */
  private val embedNearDupBanded = QueryDef(
    "llm_embed_neardup_banded",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val bits = SimilarityApi.adaptiveBandBits(embeddingsCount(s, d))
      val planes = emb.filter(col("vec_id").between(10, 10 + 4 * bits - 1))
        .select((col("vec_id") - 10).as("p_id"), col("embedding").as("p_emb"))
      val sigs = SimilarityApi.signBandSignatures(
        emb, planes, "vec_id", "embedding", bandBits = bits)
      val cand = SimilarityApi.bandedCandidates(sigs, "vec_id")
      SimilarityApi.verifyPairs(emb, cand, "vec_id", "embedding", tau = 0.35)
        .orderBy("a_id", "b_id")
    },
    Some(s"""WITH bcfg AS (
               SELECT GREATEST(4,
                 CAST(ceil(log2(count(*))) AS INTEGER) - 8) AS bits
               FROM embeddings),
             planes AS (
               SELECT vec_id - 10 AS p_id, embedding AS p_emb
               FROM embeddings, bcfg
               WHERE vec_id BETWEEN 10 AND 10 + 4 * bits - 1),
             packed AS (
               SELECT e.vec_id, CAST(p.p_id // bits AS BIGINT) AS band,
                 CAST(sum(CASE WHEN ${sqlDot("e.embedding", "p.p_emb")} >= 0
                          THEN CAST(1 AS BIGINT) << (p.p_id % bits)
                          ELSE 0 END) AS BIGINT) AS packed
               FROM embeddings e CROSS JOIN planes p CROSS JOIN bcfg
               GROUP BY e.vec_id, band),
             sigs AS (
               SELECT vec_id, band, ${bucketHashSql("band", "packed")} AS bucket
               FROM packed),
             cand AS (
               SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
               FROM sigs a JOIN sigs b
                 ON a.band = b.band AND a.bucket = b.bucket
               WHERE a.vec_id < b.vec_id)
             SELECT a_id, b_id, sim FROM (
               SELECT c.a_id, c.b_id,
                 round(${sqlDot("ea.embedding", "eb.embedding")}, 6) AS sim
               FROM cand c
               JOIN embeddings ea ON c.a_id = ea.vec_id
               JOIN embeddings eb ON c.b_id = eb.vec_id)
             WHERE sim >= 0.35
             ORDER BY a_id, b_id"""))

  /** Cross-batch INCREMENTAL embedding dedup against a persisted
    * VECTOR ledger — the embedding analog of `llm_dedup_incremental`:
    * the prior corpus persists sign-LSH band signatures (candidate
    * index, bucketed by (band, bucket)) and the vectors (verify side,
    * bucketed by id) once per snapshot; a new batch probes the index
    * and exact-verifies candidates — history is never rescanned and
    * only batch-derived rows shuffle. Two-snapshot fixture: the batch
    * plants exact copies (vectors 100..149 under new ids → dup at
    * sim ≈ 1.0 of their originals) and NEGATED vectors (200..249 →
    * cosine −1 to their originals, ≤ incidental 0.48 to everything
    * else ⇒ new). All bucket arithmetic and scoring use the bit-exact
    * dot fold, so the whole two-phase dedup is hash-exact in DuckDB —
    * no tolerance games. Ledger build memoized per (session, sfDir)
    * like the text ledger. */
  private val embedIncrementalLedgerBuilt =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (String, String)]()

  private val embedIncremental = QueryDef(
    "llm_embed_incremental",
    (s, d) => {
      import graft.Scratch.{runTag, tmpPathRaw}
      val emb = Tables.embeddings(s, d)
      val planes = emb.filter(col("vec_id").between(10, 25))
        .select((col("vec_id") - 10).as("p_id"), col("embedding").as("p_emb"))
      val batch = emb.filter(col("vec_id").between(100, 149))
          .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id").between(200, 249))
          .select((col("vec_id") + 20000).as("vec_id"),
            expr("transform(embedding, x -> -x)").as("embedding")))
      val tag = "graft_vledger_" + runTag(d)
      val (sigTab, vecTab) = embedIncrementalLedgerBuilt.computeIfAbsent(
        (s, d), _ => SimilarityApi.writeVectorLedger(
          emb, planes, "vec_id", "embedding", bandBits = 4, tag, tmpPathRaw))
      SimilarityApi.dedupAgainstVectorLedger(batch, planes,
          "vec_id", "embedding", sigTab, vecTab, tau = 0.9, bandBits = 4)
        .orderBy("vec_id")
    },
    Some(s"""WITH planes AS (
               SELECT vec_id - 10 AS p_id, embedding AS p_emb FROM embeddings
               WHERE vec_id BETWEEN 10 AND 25),
             batch AS (
               SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings
               WHERE vec_id BETWEEN 100 AND 149
               UNION ALL
               SELECT vec_id + 20000, list_transform(embedding, x -> -x)
               FROM embeddings WHERE vec_id BETWEEN 200 AND 249),
             led_packed AS (
               SELECT e.vec_id, CAST(p.p_id // 4 AS BIGINT) AS band,
                 CAST(sum(CASE WHEN ${sqlDot("e.embedding", "p.p_emb")} >= 0
                          THEN CAST(1 AS BIGINT) << (p.p_id % 4)
                          ELSE 0 END) AS BIGINT) AS packed
               FROM embeddings e CROSS JOIN planes p
               GROUP BY e.vec_id, band),
             led_sig AS (
               SELECT vec_id, band, ${bucketHashSql("band", "packed")} AS bucket
               FROM led_packed),
             bat_packed AS (
               SELECT b.vec_id, CAST(p.p_id // 4 AS BIGINT) AS band,
                 CAST(sum(CASE WHEN ${sqlDot("b.embedding", "p.p_emb")} >= 0
                          THEN CAST(1 AS BIGINT) << (p.p_id % 4)
                          ELSE 0 END) AS BIGINT) AS packed
               FROM batch b CROSS JOIN planes p
               GROUP BY b.vec_id, band),
             bat_sig AS (
               SELECT vec_id, band, ${bucketHashSql("band", "packed")} AS bucket
               FROM bat_packed),
             cand AS (
               SELECT DISTINCT b.vec_id, l.vec_id AS pid
               FROM bat_sig b JOIN led_sig l
                 ON b.band = l.band AND b.bucket = l.bucket),
             ver AS (
               SELECT c.vec_id, c.pid,
                 round(${sqlDot("bv.embedding", "lv.embedding")}, 6) AS sim
               FROM cand c
               JOIN batch bv ON c.vec_id = bv.vec_id
               JOIN embeddings lv ON c.pid = lv.vec_id),
             hit AS (
               SELECT vec_id, pid, sim FROM (
                 SELECT vec_id, pid, sim,
                   row_number() OVER (PARTITION BY vec_id ORDER BY pid) AS rn
                 FROM ver WHERE sim >= 0.9)
               WHERE rn = 1)
             SELECT b.vec_id,
               CASE WHEN h.pid IS NOT NULL THEN 'dup' ELSE 'new' END AS status,
               CAST(coalesce(h.pid, -1) AS BIGINT) AS matched_prior,
               coalesce(h.sim, CAST(-1.0 AS DOUBLE)) AS sim
             FROM batch b LEFT JOIN hit h ON b.vec_id = h.vec_id
             ORDER BY b.vec_id"""))

  /** Multimodal projection: relational (label filter) + text predicate
    * + vector similarity composed in one plan — documents ⋈ embeddings
    * on id, scored against the query vector. */
  private val multimodalProject = QueryDef(
    "llm_multimodal_project",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      Tables.documents(s, d)
        .join(emb, col("doc_id") === col("vec_id"))
        .filter(col("lang") === "en" && col("text").contains("merge") &&
          col("label") < 5)
        .crossJoin(broadcast(q))
        .select(
          col("doc_id"), col("lang"), col("label"),
          round(dotProduct(col("embedding"), col("q_emb")), 6).as("sim"))
        .orderBy("doc_id")
    },
    Some(s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
             SELECT doc_id, lang, label,
               round(${sqlDot("embedding", "q_emb")}, 6) AS sim
             FROM documents
             JOIN embeddings ON doc_id = vec_id
             CROSS JOIN q
             WHERE lang = 'en' AND contains(text, 'merge') AND label < 5
             ORDER BY doc_id"""))

  /** Sign-LSH bucketed ANN — the hash-bucket alternative to IVF: each
    * vector's bucket is the sign pattern of its dot products with 6 fixed
    * hyperplanes (embedding vectors 10..15 double as the deterministic
    * hyperplane set → 64 buckets), so similar vectors collide.
    * Search = compute the query's bucket, scan only that bucket,
    * exact top-K inside. All arithmetic is the bit-exact dot fold, so
    * bucket assignment and ranking are oracle-checkable — no
    * tolerance games even though the index is "approximate". */
  private val annLsh = QueryDef(
    "llm_ann_lsh",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val planes = emb.filter(col("vec_id").between(10, 15))
        .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      def bucketOf(df: DataFrame, embCol: String): DataFrame =
        df.crossJoin(broadcast(planes))
          .withColumn("bit",
            when(dotProduct(col(embCol), col("p_emb")) >= 0, 1L).otherwise(0L))
          .withColumn("weighted",
            col("bit") * expr("shiftleft(CAST(1 AS BIGINT), CAST(p_id AS INT) - 10)"))
          .groupBy(df.columns.map(col): _*)
          .agg(sum("weighted").as("bucket"))
      val bucketed = bucketOf(emb.select(col("vec_id"), col("embedding")), "embedding")
      val qBucket = bucketOf(q, "q_emb").select(col("q_emb"), col("bucket"))
      bucketed
        .join(broadcast(qBucket), "bucket")
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("bucket"),
          round(dotProduct(col("embedding"), col("q_emb")), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(5)
    },
    Some(s"""WITH planes AS (
               SELECT vec_id AS p_id, embedding AS p_emb FROM embeddings
               WHERE vec_id BETWEEN 10 AND 15),
             bucketed AS (
               SELECT e.vec_id, e.embedding,
                 CAST(sum(CASE WHEN ${sqlDot("e.embedding", "p.p_emb")} >= 0
                          THEN CAST(1 AS BIGINT) << (p.p_id - 10)
                          ELSE 0 END) AS BIGINT) AS bucket
               FROM embeddings e CROSS JOIN planes p
               GROUP BY e.vec_id, e.embedding),
             qb AS (
               SELECT q.q_emb,
                 CAST(sum(CASE WHEN ${sqlDot("q.q_emb", "p.p_emb")} >= 0
                          THEN CAST(1 AS BIGINT) << (p.p_id - 10)
                          ELSE 0 END) AS BIGINT) AS bucket
               FROM (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
               CROSS JOIN planes p
               GROUP BY q.q_emb)
             SELECT b.vec_id, b.bucket,
               round(${sqlDot("b.embedding", "qb.q_emb")}, 6) AS sim
             FROM bucketed b JOIN qb ON b.bucket = qb.bucket
             WHERE b.vec_id <> 0
             ORDER BY sim DESC, vec_id ASC LIMIT 5"""))

  /** Per-label centroid (mean vector by dimension) — the building
    * block for IVF codebook training / k-means steps. Implemented as
    * posexplode → (label, dim) aggregate: the shuffle carries scalar
    * partials, never whole vectors, so it parallelizes over
    * rows × dimensions at any scale. */
  private val embedCentroid = QueryDef(
    "llm_embed_centroid",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), (col("pos") + 1).cast("long").as("pos"),
          col("col").cast("double").as("v"))
        .groupBy("label", "pos")
        .agg(round(avg("v"), 6).as("dim_avg"), count(lit(1)).as("n"))
        .orderBy("label", "pos"),
    Some("""SELECT label, i AS pos,
              round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS dim_avg,
              CAST(count(*) AS BIGINT) AS n
            -- DuckDB 1.0 generate_series takes constants only (no lateral
            -- column refs): 64 == the embeddings table's fixed dimension
            -- (FIXTURES.md); the Spark side derives it from the data.
            FROM embeddings, generate_series(1, 64) t(i)
            GROUP BY label, i ORDER BY label, pos"""))

  /** k-NN JOIN: top-3 neighbors for EVERY query vector in a batch
    * (vec_id < 5), not just one — the shape of batch retrieval /
    * embedding-based dedup lookups. The query batch is broadcast, so
    * the corpus is scanned once regardless of batch size; per-query
    * ranking is one window over the broadcast-joined scores. At 100 TB
    * the same plan holds with the batch capped at broadcast size
    * (~10k vectors); beyond that, IVF-partition both sides. */
  private val knnJoin = QueryDef(
    "llm_knn_join",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      emb.filter(col("vec_id") >= 5)
        .crossJoin(broadcast(q))
        .withColumn("sim", round(dotProduct(col("embedding"), col("q_emb")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("q_id", "vec_id", "sim", "rk")
        .orderBy("q_id", "rk")
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                        FROM embeddings WHERE vec_id < 5),
             scored AS (
               SELECT q_id, vec_id,
                 round(${sqlDot("embedding", "q_emb")}, 6) AS sim
               FROM embeddings CROSS JOIN q
               WHERE vec_id >= 5)
             SELECT q_id, vec_id, sim, rk FROM (
               SELECT q_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, vec_id ASC) AS rk
               FROM scored)
             WHERE rk <= 3 ORDER BY q_id, rk"""))

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023,
    * arXiv:2303.09540): partition the embedding space into clusters,
    * then prune documents whose embedding is cosine-close to an
    * earlier document IN THE SAME CLUSTER — the quadratic pair search
    * runs per cluster, never across the corpus, which is the whole
    * trick: with k ∝ √n clusters the expected pair work is O(n²/k) =
    * O(n^1.5), and at 100 TB each cluster's members co-locate in one
    * bucket (the IVF assignment table this engine already persists),
    * so the pair stage is a per-bucket local join with no corpus-wide
    * shuffle. Within-cluster blocks above a fail-loud cap refuse to
    * launch (same contract as the other quadratic baselines; the
    * banded LSH variant is the in-cluster escape hatch at scale).
    *
    * Determinism: clusters come from a TRAINED codebook —
    * [[SimilarityApi.kmeans]] (k = 8, one Lloyd iteration from the
    * deterministic smallest-id init) with `roundDims = 6`, which
    * rounds each centroid dimension before the float cast so the one
    * cross-engine-wobbly step (the FP mean) is pinned eight orders of
    * magnitude above its error; every other step (argmax bit-exact
    * dot with lowest-centroid-id ties, removal rule "b is pruned iff
    * some a < b in its cluster has round(sim,6) ≥ 0.35", exemplar =
    * smallest such a) is id-tiebroken — so the DuckDB oracle replays
    * the ENTIRE pipeline, Lloyd iteration included, hash-exactly.
    * The assignment is persisted once; the fail-loud quadratic guard
    * and the pair stage share that one materialization (and since the
    * logical plan is deterministic per (session, dir), re-runs reuse
    * the same cache entry instead of stacking new ones). */
  private val semDedup = QueryDef(
    "llm_semdedup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val codebook = SimilarityApi.kmeans(
        emb, "vec_id", "embedding", k = 8, iterations = 1, roundDims = 6)
      val assigned = SimilarityApi
        .assignClusters(emb, codebook, "vec_id", "embedding")
        .persist()
      val maxCluster = assigned.groupBy("cluster").count()
        .agg(max("count")).head.getLong(0)
      require(maxCluster <= 20000L,
        s"llm_semdedup: largest cluster holds $maxCluster vectors — the " +
          "exact within-cluster pair stage is quadratic by design and " +
          "refuses blocks past 20k; raise k (more clusters) or switch " +
          "the in-cluster stage to the banded LSH variant")
      val a = assigned.select(col("cluster"),
        col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = assigned.select(col("cluster"),
        col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      a.join(b, Seq("cluster"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("sim",
          round(dotProduct(col("a_emb"), col("b_emb")), 6))
        .filter(col("sim") >= 0.35)
        .groupBy(col("cluster"), col("b_id").as("removed_id"))
        .agg(min("a_id").as("exemplar_id"), max("sim").as("max_sim"))
        .orderBy("cluster", "removed_id")
    },
    // The oracle REPLAYS THE TRAINING: init codebook = 8 smallest-id
    // vectors (0-based c_id in id order), one assign pass, per-dim
    // mean rounded to 6 decimals, float cast, re-normalize with the
    // same left-to-right fold, float cast — then the final assignment
    // and pair stage. Every float/double boundary mirrors the Spark
    // plan exactly (see SimilarityApi.kmeans roundDims).
    Some(s"""WITH cents0 AS (
               SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS c_id, embedding AS c_emb
               FROM (SELECT vec_id, embedding FROM embeddings
                     ORDER BY vec_id LIMIT 8)),
             asg0 AS (
               SELECT vec_id, c_id AS cluster, embedding FROM (
                 SELECT e.vec_id, c.c_id, e.embedding,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqlDot("e.embedding", "c.c_emb")} DESC,
                              c.c_id ASC) AS rn
                 FROM embeddings e CROSS JOIN cents0 c) t WHERE rn = 1),
             dims AS (
               SELECT cluster,
                 unnest(generate_series(1, len(embedding))) AS pos,
                 unnest(list_transform(embedding,
                   x -> CAST(x AS DOUBLE))) AS v
               FROM asg0),
             means AS (
               SELECT cluster AS c_id, pos, round(avg(v), 6) AS dim_avg
               FROM dims GROUP BY cluster, pos),
             cbf AS (
               SELECT c_id, list(CAST(dim_avg AS REAL) ORDER BY pos) AS f0
               FROM means GROUP BY c_id),
             cb1 AS (
               SELECT c_id, list_transform(f0, x -> CAST(CAST(x AS DOUBLE) /
                 sqrt(list_aggregate(list_transform(f0,
                   y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))
                 AS REAL)) AS c_emb
               FROM cbf),
             asg AS (
               SELECT vec_id, c_id AS cluster, embedding FROM (
                 SELECT e.vec_id, c.c_id, e.embedding,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqlDot("e.embedding", "c.c_emb")} DESC,
                              c.c_id ASC) AS rn
                 FROM embeddings e CROSS JOIN cb1 c) t WHERE rn = 1),
             pairs AS (
               SELECT a.cluster, a.vec_id AS a_id, b.vec_id AS b_id,
                 round(${sqlDot("a.embedding", "b.embedding")}, 6) AS sim
               FROM asg a JOIN asg b
                 ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
             SELECT cluster, b_id AS removed_id,
               CAST(min(a_id) AS BIGINT) AS exemplar_id,
               max(sim) AS max_sim
             FROM pairs WHERE sim >= 0.35
             GROUP BY cluster, b_id ORDER BY cluster, removed_id"""))

  val defs: Seq[QueryDef] = Seq(
    cosineTopk, annIvf, annLsh, embedNearDup, embedNearDupBanded,
    embedIncremental, multimodalProject, embedCentroid, knnJoin,
    semDedup)
}
