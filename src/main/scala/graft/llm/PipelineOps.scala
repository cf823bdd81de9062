package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (builder brief: "the operations a
  * large-scale training-data pipeline would need"): deterministic
  * train/val/test splitting, shard assignment, sequence packing,
  * document chunking, stratified sampling, embedding quantization and
  * TF-IDF term weighting.
  *
  * Determinism across engines: every "random" choice is a hash of a
  * stable key — md5 (available on both engines) hex-decoded to a
  * BIGINT (`conv(hex,16,10)` in Spark ↔ `('0x'||hex)::BIGINT` in
  * DuckDB). Splits are therefore reproducible, stable under
  * re-partitioning, and need no shared state — the 100 TB property:
  * any executor can compute any row's split without coordination.
  */
object PipelineOps {

  /** 60-bit integer from the first 15 hex chars of md5(prefix||key) —
    * the cross-engine deterministic hash both sides of the oracle
    * compute identically. */
  private def hashBucketExpr(prefix: String, key: String, mod: Int): String =
    s"CAST(conv(substr(md5(concat('$prefix', CAST($key AS STRING))), 1, 15), 16, 10) AS BIGINT) % $mod"

  private def hashBucketSql(prefix: String, key: String, mod: Int): String =
    s"('0x' || substr(md5('$prefix' || CAST($key AS VARCHAR)), 1, 15))::BIGINT % $mod"

  /** Deterministic 80/10/10 train/val/test split: bucket = h(doc_id) %
    * 100. Unlike `rand()`-based splits this is stable across runs,
    * engines and partitionings, and a doc's assignment never changes
    * when the corpus grows — the property a multi-epoch training
    * pipeline needs. */
  private val trainSplit = QueryDef(
    "llm_train_split",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", expr(hashBucketExpr("split:", "doc_id", 100)))
        .select(
          col("doc_id"), col("lang"), col("bucket"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM (SELECT doc_id, lang,
                     ${hashBucketSql("split:", "doc_id", 100)} AS bucket
                   FROM documents)
             ORDER BY doc_id"""))

  /** Hash-balanced shard assignment with per-shard stats — the "write
    * the corpus as N training shards" step. Hash-mod sharding needs no
    * global sort or coordination and balances by the law of large
    * numbers; the stats prove it (counts/tokens per shard). */
  private val shardAssign = QueryDef(
    "llm_shard_assign",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("shard_id", expr(hashBucketExpr("shard:", "doc_id", 8)))
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .groupBy("shard_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          sum("n_chars").as("total_chars"))
        .orderBy("shard_id"),
    Some(s"""SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
             FROM (SELECT ${hashBucketSql("shard:", "doc_id", 8)} AS shard_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     n_chars
                   FROM documents)
             GROUP BY shard_id ORDER BY shard_id"""))

  /** Greedy sequence packing into 256-token context windows: docs are
    * packed in doc_id order per language; a doc's pack is the running
    * token count before it, integer-divided by the context length.
    * One window over (lang) — a single shuffle; at 100 TB `lang` (or a
    * finer pack-group key) bounds each partition's sort. */
  private val packSequences = QueryDef(
    "llm_pack_sequences",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("cum", sum("n_tokens").over(w))
        .select(
          col("doc_id"), col("lang"), col("n_tokens"),
          expr("(cum - n_tokens) div 256").as("pack_id"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_tokens, CAST((cum - n_tokens) // 256 AS BIGINT) AS pack_id
            FROM (
              SELECT doc_id, lang, n_tokens,
                sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM (SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents))
            ORDER BY doc_id"""))

  /** Overlapping token chunks (40-token window, stride 20) — the
    * embedding/RAG chunking step. One generator row per chunk; the
    * chunk text never leaves the executor (only its md5 digest is
    * emitted), which is what keeps the shuffle narrow at scale. */
  private val docChunk = QueryDef(
    "llm_doc_chunk",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("chunk_id", explode(expr("sequence(CAST(0 AS BIGINT), (n - 1) div 20)")))
        .withColumn("chunk", expr("slice(toks, CAST(chunk_id * 20 + 1 AS INT), 40)"))
        .select(
          col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_chunk_toks"),
          md5(array_join(col("chunk"), " ")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id"),
    Some("""SELECT doc_id, chunk_id,
              CAST(len(toks[CAST(chunk_id * 20 + 1 AS BIGINT) :
                            CAST(chunk_id * 20 + 40 AS BIGINT)]) AS BIGINT)
                AS n_chunk_toks,
              md5(array_to_string(
                toks[CAST(chunk_id * 20 + 1 AS BIGINT) :
                     CAST(chunk_id * 20 + 40 AS BIGINT)], ' ')) AS chunk_md5
            FROM (
              SELECT doc_id, toks,
                unnest(generate_series(0, (len(toks) - 1) // 20)) AS chunk_id
              FROM (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents))
            ORDER BY doc_id, chunk_id"""))

  /** Stratified deterministic sample: 20 docs per language, chosen by
    * hash order — every stratum is covered regardless of its share of
    * the corpus, and the choice is reproducible (no rand()). The rank
    * window shuffles once on the stratum key. */
  private val sampleStratified = QueryDef(
    "llm_sample_stratified",
    (s, d) => {
      val w = Window.partitionBy("lang")
        .orderBy(col("hk").asc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("hk", expr(hashBucketExpr("sample:", "doc_id", 1000000)))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select("doc_id", "lang", "rk")
        .orderBy("lang", "rk")
    },
    Some(s"""SELECT doc_id, lang, rk FROM (
               SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang ORDER BY hk ASC, doc_id ASC) AS rk
               FROM (SELECT doc_id, lang,
                       ${hashBucketSql("sample:", "doc_id", 1000000)} AS hk
                     FROM documents))
             WHERE rk <= 20 ORDER BY lang, rk"""))

  /** Quality-weighted deterministic subsample — reproducible DATA
    * MIXING: each quality band gets a target keep-rate (high 100%,
    * mid 50%, low 10%) and a doc is kept iff its 60-bit md5 bucket
    * falls under the band's rate. Unlike `sample()`/rand() this is
    * stable across runs, engines, partitionings and corpus growth —
    * a doc's fate never changes when unrelated data arrives, which is
    * what makes ablation reruns and incremental re-mixes comparable.
    * One stateless scan; band here is a token-count proxy (the
    * llm_quality_score signals slot in unchanged). */
  private val sampleWeighted = QueryDef(
    "llm_sample_weighted",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("band", expr(
          """CASE WHEN n_toks >= 40 THEN 'high'
            |     WHEN n_toks >= 15 THEN 'mid' ELSE 'low' END""".stripMargin))
        .withColumn("rate", expr(
          "CASE band WHEN 'high' THEN 100 WHEN 'mid' THEN 50 ELSE 10 END"))
        .withColumn("hb", expr(hashBucketExpr("mix:", "doc_id", 100)))
        .filter(col("hb") < col("rate"))
        .select("doc_id", "band", "hb")
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, band, hb FROM (
               SELECT doc_id,
                 CASE WHEN n_toks >= 40 THEN 'high'
                      WHEN n_toks >= 15 THEN 'mid' ELSE 'low' END AS band,
                 CASE WHEN n_toks >= 40 THEN 100
                      WHEN n_toks >= 15 THEN 50 ELSE 10 END AS rate,
                 ${hashBucketSql("mix:", "doc_id", 100)} AS hb
               FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_toks
                     FROM documents))
             WHERE hb < rate ORDER BY doc_id"""))

  /** 4-bit scalar quantization of embeddings (16 levels over [-1, 1)) —
    * the storage-compression step of a 100 TB vector corpus (64 floats
    * → 32 bytes). Emits the exact integer code sum and the max
    * reconstruction error; codes are clamped so the x = 1.0 edge cell
    * is closed. */
  private val quantize = QueryDef(
    "llm_quantize",
    (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("codes", expr(
          """transform(embedding, x ->
            |  least(15, greatest(0,
            |    CAST(floor((CAST(x AS DOUBLE) + 1.0d) / 2.0d * 16.0d) AS BIGINT))))"""
            .stripMargin))
        .withColumn("errs", expr(
          """transform(arrays_zip(embedding, codes), p ->
            |  abs(CAST(p.embedding AS DOUBLE)
            |      - (CAST(p.codes AS DOUBLE) / 8.0d - 1.0d + 0.0625d)))"""
            .stripMargin))
        .select(
          col("vec_id"),
          expr("aggregate(codes, CAST(0 AS BIGINT), (a, c) -> a + c)").as("code_sum"),
          round(array_max(col("errs")), 6).as("max_err"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id,
              CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
              round(list_max(
                list_transform(generate_series(1, len(codes)),
                  i -> abs(CAST(embedding[i] AS DOUBLE)
                           - (CAST(codes[i] AS DOUBLE) / 8.0 - 1.0 + 0.0625)))), 6)
                AS max_err
            FROM (
              SELECT vec_id, embedding,
                list_transform(embedding, x ->
                  least(15, greatest(0,
                    CAST(floor((CAST(x AS DOUBLE) + 1.0) / 2.0 * 16.0) AS BIGINT))))
                  AS codes
              FROM embeddings)
            ORDER BY vec_id"""))

  /** TF-IDF top-3 terms per document, log-free variant:
    * (tf / doc_len) · (N / df) — exact integer ratios evaluated in the
    * identical order on both engines, so scores are bit-deterministic.
    * Plan shape: one explode + two-phase count (tf), a token-keyed
    * aggregate (df, broadcastable — vocabulary ≪ corpus), one rank
    * window. No driver-side collection. */
  private val tfidf = QueryDef(
    "llm_tfidf",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val docLen = Window.partitionBy("doc_id")
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("token").asc)
      tf.withColumn("doc_len", sum("tf").over(docLen))
        .join(broadcast(df), "token")
        .crossJoin(broadcast(n))
        .withColumn("score",
          round((col("tf").cast("double") / col("doc_len")) *
            (col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "token", "score", "rk")
        .orderBy("doc_id", "rk")
    },
    Some("""WITH tf AS (
              SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                    FROM documents)
              GROUP BY doc_id, token),
            df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY token),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
            SELECT doc_id, token, score, rk FROM (
              SELECT doc_id, token, score,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, token ASC) AS rk
              FROM (
                SELECT tf.doc_id, tf.token,
                  round((CAST(tf.tf AS DOUBLE) /
                         CAST(sum(tf.tf) OVER (PARTITION BY tf.doc_id) AS BIGINT)) *
                        (CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
                FROM tf JOIN df ON tf.token = df.token CROSS JOIN n))
            WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** PII scrubbing: regex redaction of emails and numeric identifiers
    * before training. The corpus is synthetic (no real PII), so each
    * doc is deterministically salted with an email + numeric id first,
    * then scrubbed; counts and the scrubbed digest prove the redaction.
    * Email pattern stays in the Java∩RE2 subset ([.] instead of \\.)
    * and emails are scrubbed before digit runs so '<EMAIL>' survives.
    * Pure per-row codegen'd string work — embarrassingly parallel. */
  private val piiScrub = QueryDef(
    "llm_pii_scrub",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("raw", concat(
          lit("contact user"), col("doc_id"), lit("@mail.com ref "),
          (col("doc_id") * 7919).cast("string"), lit(" "), col("text")))
        .withColumn("no_email",
          regexp_replace(col("raw"), "[a-z0-9]+@[a-z]+[.][a-z]+", "<EMAIL>"))
        .select(
          col("doc_id"),
          expr("CAST(size(regexp_extract_all(raw, '[a-z0-9]+@[a-z]+[.][a-z]+', 0)) AS BIGINT)")
            .as("n_emails"),
          expr("CAST(size(regexp_extract_all(no_email, '[0-9]+', 0)) AS BIGINT)")
            .as("n_nums"),
          md5(regexp_replace(col("no_email"), "[0-9]+", "<NUM>")).as("scrub_md5"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CAST(len(regexp_extract_all(raw, '[a-z0-9]+@[a-z]+[.][a-z]+')) AS BIGINT)
                AS n_emails,
              CAST(len(regexp_extract_all(no_email, '[0-9]+')) AS BIGINT) AS n_nums,
              md5(regexp_replace(no_email, '[0-9]+', '<NUM>', 'g')) AS scrub_md5
            FROM (
              SELECT doc_id, raw,
                regexp_replace(raw, '[a-z0-9]+@[a-z]+[.][a-z]+', '<EMAIL>', 'g')
                  AS no_email
              FROM (SELECT doc_id,
                      'contact user' || CAST(doc_id AS VARCHAR) || '@mail.com ref '
                        || CAST(doc_id * 7919 AS VARCHAR) || ' ' || text AS raw
                    FROM documents))
            ORDER BY doc_id"""))

  /** Data-mixture composition report: per (lang, source) domain —
    * docs, tokens, chars, and each domain's share of total tokens.
    * This is the input to mixture-weight planning (how much of each
    * domain goes into a training run). One partial-agg shuffle over
    * the corpus; the global-share window runs on the already-tiny
    * grouped result, so the unpartitioned window is not a scale
    * hazard. */
  private val domainMix = QueryDef(
    "llm_domain_mix",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("tok_share",
          round(col("n_tokens").cast("double") /
            sum(col("n_tokens")).over(Window.partitionBy()), 4))
        .orderBy("lang", "source"),
    Some("""WITH t AS (SELECT lang, source,
                         CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                           AS n_tokens,
                         CAST(sum(n_chars) AS BIGINT) AS sum_chars
                       FROM documents GROUP BY lang, source)
             SELECT lang, source, n_docs, n_tokens, sum_chars,
               round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 4)
                 AS tok_share
             FROM t ORDER BY lang, source"""))

  /** BM25 top-10 retrieval for a fixed 3-term query — the lexical
    * scorer behind every "retrieve then train/evaluate" loop (and the
    * standard hybrid partner to [[graft.llm.VectorOps]]'s dense
    * cosine top-k). Log-free idf variant `(N - df + ½)/(df + ½)` (the
    * same monotone-transform discipline as [[tfidf]] — both engines'
    * `ln` differ in the last ulp, rational arithmetic does not);
    * k1 = 1.2, b = 0.75 as usual. Determinism: every division/multiply
    * in the identical order on both engines, and the ≤3 per-term
    * components are summed in FIXED term order via conditional
    * aggregates (a plain SUM may reduce in any order — last-ulp
    * nondeterminism), then rounded to 6dp before ranking.
    *
    * Plan shape at 100 TB: tf touches only rows containing the query
    * terms (filter below the aggregate), df/N/avgdl are tiny
    * broadcast sides, and the top-10 is TakeOrderedAndProject — no
    * global sort, no global window. */
  private val bm25TopK = QueryDef(
    "llm_bm25_topk",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val dl = docs.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
      val g = docs.agg(count(lit(1)).as("n_docs"),
        sum(size(col("t")).cast("long")).as("total"))
      val tf = docs.select(col("doc_id"), explode(col("t")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      // Query terms DERIVED from the corpus (top-3 by df, token
      // tiebreak — exact-integer ranking, reproducible on any corpus;
      // a hardcoded term list goes stale the moment the corpus
      // changes, which the 10x replica-salted probe demonstrated).
      val top3 = dfreq.orderBy(col("df").desc, col("token").asc).limit(3)
      val comp = tf.join(broadcast(top3), Seq("token"))
        .join(dl, "doc_id")
        .crossJoin(broadcast(g))
        .withColumn("c", expr(
          """((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5D)
            |   / (CAST(df AS DOUBLE) + 0.5D))
            | * ((CAST(tf AS DOUBLE) * 2.2D)
            |   / (CAST(tf AS DOUBLE) + 1.2D * (0.25D + 0.75D
            |      * (CAST(dl AS DOUBLE)
            |         / (CAST(total AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"""
            .stripMargin))
      // ≤3 components per doc, summed in FIXED token order via an
      // explicit left-to-right fold over the token-sorted list (a
      // plain SUM may reduce doubles in any order — last-ulp
      // nondeterminism across engines/parallelism).
      comp.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("token"), col("c"))))
          .as("l"))
        .select(col("doc_id"), round(expr(
          """coalesce(try_element_at(l, 1).c, 0D)
            | + coalesce(try_element_at(l, 2).c, 0D)
            | + coalesce(try_element_at(l, 3).c, 0D)""".stripMargin), 6)
          .as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
                 dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
                 g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(len(t)) AS BIGINT) AS total FROM toks),
                 tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                        FROM (SELECT doc_id, unnest(t) AS token FROM toks)
                        GROUP BY doc_id, token),
                 dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                           FROM tf GROUP BY token),
                 top3 AS (SELECT token, df FROM dfreq
                          ORDER BY df DESC, token ASC LIMIT 3),
                 comp AS (SELECT tf.doc_id, tf.token,
                     ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
                     * ((CAST(tf AS DOUBLE) * 2.2)
                        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                           * (CAST(dl.dl AS DOUBLE)
                              / (CAST(g.total AS DOUBLE)
                                 / CAST(g.n_docs AS DOUBLE)))))) AS c
                   FROM tf JOIN top3 ON tf.token = top3.token
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN g),
                 lists AS (SELECT doc_id, list(c ORDER BY token ASC) AS l
                           FROM comp GROUP BY doc_id)
            SELECT doc_id,
              round(coalesce(l[1], 0) + coalesce(l[2], 0)
                + coalesce(l[3], 0), 6) AS score
            FROM lists
            ORDER BY score DESC, doc_id ASC LIMIT 10"""))

  val defs: Seq[QueryDef] = Seq(
    trainSplit, shardAssign, packSequences, docChunk,
    sampleStratified, sampleWeighted, quantize, tfidf, piiScrub, domainMix,
    bm25TopK)
}
