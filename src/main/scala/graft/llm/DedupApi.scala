package graft.llm

import graft.functions.TextHashFunctions.{minhashSig, simhash64, sortedIntersectCount}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public, parameterized dedup / similarity API — the library surface
  * a pipeline author calls on their own DataFrames (the `llm_*`
  * queries in [[TextOps]] are thin instantiations of these over the
  * test corpus).
  *
  * Every function takes and returns DataFrames and composes with any
  * upstream source; nothing collects to the driver.
  */
object DedupApi {

  /** Distinct word-n-gram shingles of a text column, as a new column. */
  def withShingles(df: DataFrame, textCol: String, out: String = "sh",
      n: Int = 3): DataFrame = {
    val spread = (0 until n)
      .map(k => s"element_at(__toks, i + $k)").mkString(", ")
    df.withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= n)
      .withColumn(out, expr(
        s"array_distinct(transform(sequence(1, size(__toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', $spread)))"))
      .drop("__toks")
  }

  /** Hashed + sorted shingle sets (the compact pairwise-compare form). */
  def withHashedShingles(df: DataFrame, shCol: String,
      out: String = "shs"): DataFrame =
    df.withColumn(out, expr(s"sort_array(transform($shCol, t -> xxhash64(t)))"))

  /** Exact Jaccard between two sorted-hash-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = sortedIntersectCount(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Exact dedup: one row per normalized-text digest with the keeper
    * (minimum id) and the copy count. Only 16-byte digests shuffle. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("h", md5(lower(trim(col(textCol)))))
      .groupBy("h")
      .agg(min(idCol).as("keep_" + idCol), count(lit(1)).as("n_copies"))

  /** MinHash-LSH candidate pairs over a hashed-shingle column:
    * signature → band explode → band equi-join. O(corpus + collisions),
    * never O(n²). Returns (idCol_a, idCol_b) with a < b. */
  def minhashCandidates(df: DataFrame, idCol: String, hashedShinglesCol: String,
      numHashes: Int = 64, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df.withColumn("__sig", minhashSig(col(hashedShinglesCol), numHashes))
    val banded = withSig
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(__sig, b * $rows + 1, $rows)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val a = banded.select(col(idCol).as(idCol + "_a"), col("band"), col("bh"))
    val b = banded.select(col(idCol).as(idCol + "_b"), col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .filter(col(idCol + "_a") < col(idCol + "_b"))
      .select(idCol + "_a", idCol + "_b").distinct()
  }

  /** Verify candidate pairs by exact Jaccard ≥ threshold. `sets` must
    * carry (idCol, sorted-hash-array col). */
  def verifyPairs(cands: DataFrame, sets: DataFrame, idCol: String,
      setCol: String, threshold: Double): DataFrame = {
    val sa = sets.select(col(idCol).as(idCol + "_a"), col(setCol).as("__sa"))
    val sb = sets.select(col(idCol).as(idCol + "_b"), col(setCol).as("__sb"))
    cands.join(sa, idCol + "_a").join(sb, idCol + "_b")
      .withColumn("j", round(jaccard(col("__sa"), col("__sb")), 4))
      .filter(col("j") >= threshold)
      .select(idCol + "_a", idCol + "_b", "j")
  }

  /** Connected components over a duplicate-pair edge list — the
    * cluster-formation step after any near-dup detector (a doc may
    * pair with several others; training-data dedup keeps one doc PER
    * CLUSTER, not per pair). Iterative min-label propagation: every
    * round each node adopts the minimum label among itself and its
    * neighbors; fixpoint in O(component diameter) rounds. This is the
    * Pregel/GraphX CC algorithm as joins+aggregates: each round is one
    * shuffle of (node, label) longs; edges are partitioned once and
    * reused. Per-round driver traffic is a single changed-count scalar
    * (the fixpoint test — same justification as kmeans' codebook
    * readout); results are persisted per round so lineage stays flat.
    * Duplicate clusters are near-cliques (diameter ~1-2), so maxIter
    * is a pathological-chain bound, not the expected cost. Returns
    * (node, cluster) where cluster = min doc id in the component. */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame =
    dupClustersWithRounds(pairs, aCol, bCol, maxIter)._1

  /** As [[dupClusters]], also returning the number of label-propagation
    * rounds executed — the O(component diameter) quantity the scale
    * design depends on (ClusterScaleProbe measures it directly). */
  def dupClustersWithRounds(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): (DataFrame, Int) = {
    val edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("__dl")), "dst")
        .groupBy("src").agg(min("__dl").as("__nl"))
      val viaNbr = labels
        .join(nbrMin.select(col("src").as("node"), col("__nl")), Seq("node"), "left")
        .select(col("node"), col("label").as("__old"),
          least(col("label"), coalesce(col("__nl"), col("label"))).as("__l1"))
      // POINTER JUMPING (path halving): resolve each node's candidate
      // label through the current label table — label-of-label — so
      // pointer chains halve every round and convergence is
      // O(log diameter) rounds instead of O(diameter). Safe: a label is
      // always a node id inside its own component (labels only move to
      // component members and only decrease), so the fixpoint is still
      // exactly the component-min labeling; the halving join is
      // node-sized, one extra hash join per round bought against
      // (diameter − log diameter) whole rounds. Measured on the
      // diameter-6 probe graph (ClusterScaleProbe): 7 rounds → 4, and
      // 16× edges 37.2 s → 13.4 s (2.8×) — the win compounds with
      // scale because rounds, not per-round cost, were the bottleneck.
      // Clusters byte-identical (oracle re-verified).
      val next = viaNbr
        .join(labels.select(col("node").as("__ln"), col("label").as("__gl")),
          viaNbr("__l1") === col("__ln"), "left")
        .select(col("node"),
          least(col("__l1"), coalesce(col("__gl"), col("__l1"))).as("label"),
          col("__old"))
        // Lazy truncation: the changed-count below materializes the
        // round exactly once AND truncates lineage, so the final plan is
        // one round deep, not O(iterations) of stacked joins (which
        // would replay quadratically on any recompute). Lazy (not eager)
        // avoids a second materialization job per round. Under a cluster
        // checkpoint dir this is a RELIABLE checkpoint (executor-loss
        // tolerant); local mode keeps localCheckpoint — same algorithm,
        // byte-identical clusters (ScaleDesignSpec).
        .transform(d => graft.Lineage.truncateLazy(d))
      changed = next.filter(col("label") =!= col("__old")).count()
      labels = next.select("node", "label")
      iter += 1
    }
    edges.unpersist()
    (labels.select(col("node"), col("label").as("cluster")), iter)
  }

  // ---- cross-batch incremental dedup (fingerprint ledger) ----------------
  //
  // A real training pipeline dedups NEW data against a persisted ledger
  // of prior fingerprints, not within one corpus snapshot. The ledger is
  // three bucketed tables (pay the shuffle once at snapshot time; every
  // later ingest joins exchange-free on the ledger side):
  //   <tag>_dig (h, id)    bucketed by h   — exact md5 digests
  //   <tag>_fp  (fp, id)   bucketed by fp  — winnowing fingerprint index
  //   <tag>_set (id, shs)  bucketed by id  — sorted hashed-shingle sets
  //                                          for candidate verification
  // Ingest = (1) exact: batch digests bucket-joined against _dig, hits
  // dropped; (2) near: survivors' fingerprints equi-joined against _fp
  // for candidates, exact Jaccard on _set verifies; (3) accepted docs'
  // keys appended back so the next batch sees them. The fingerprint
  // family is the portable 60-bit md5 prefix (reproducible in DuckDB /
  // outside Spark — same trade as [[TextOps]]' llm_fingerprint); the
  // verify sets use xxhash64 shingles for wire compactness.

  /** Winnowing fingerprints (window w=4 over 3-gram hashes, per-window
    * minimum, distinct), exploded to one (id, fp) row each — the
    * ledger's candidate index. Docs under 6 tokens yield no rows (no
    * fingerprint ⇒ only exact dedup can catch them). */
  def portableFingerprints(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= 6)
      .withColumn("__hashes", expr(
        """transform(sequence(1, size(__toks) - 2),
          |  i -> CAST(conv(substring(md5(concat_ws(' ',
          |         __toks[i-1], __toks[i], __toks[i+1])), 1, 15), 16, 10)
          |       AS BIGINT))""".stripMargin))
      .select(col(idCol),
        explode(expr(
          """array_distinct(transform(sequence(1, size(__hashes) - 3),
            |  i -> array_min(slice(__hashes, i, 4))))""".stripMargin)).as("fp"))

  /** Build + persist the ledger for a corpus snapshot as three bucketed
    * tables; returns (digestTable, fpTable, setsTable). `pathFor` maps a
    * table name to its storage path (scratch dir in tests, warehouse
    * path in production). */
  def writeLedger(prior: DataFrame, idCol: String, textCol: String,
      tag: String, pathFor: String => String, buckets: Int = 8)
      : (String, String, String) = {
    val digTab = tag + "_dig"; val fpTab = tag + "_fp"; val setTab = tag + "_set"
    prior.select(md5(lower(trim(col(textCol)))).as("h"), col(idCol))
      .write.mode("overwrite").bucketBy(buckets, "h")
      .option("path", pathFor(digTab)).saveAsTable(digTab)
    portableFingerprints(prior, idCol, textCol)
      .write.mode("overwrite").bucketBy(buckets, "fp")
      .option("path", pathFor(fpTab)).saveAsTable(fpTab)
    withHashedShingles(withShingles(prior, textCol), "sh")
      .select(col(idCol), col("shs"))
      .write.mode("overwrite").bucketBy(buckets, idCol)
      .option("path", pathFor(setTab)).saveAsTable(setTab)
    (digTab, fpTab, setTab)
  }

  /** Dedup a new batch against a persisted ledger. Returns one row per
    * batch doc: (idCol, status ∈ dup_exact|dup_near|new, matched_prior
    * = min matching ledger id, −1 for new). The batch's digests are
    * bucket-written first so the phase-1 join is exchange-free on BOTH
    * sides (asserted in ScaleDesignSpec); the phase-2 candidate join
    * shuffles only the batch's exploded fingerprints — the ledger side
    * is pre-bucketed and never moves.
    *
    * Plan-audit note: the composed plan counts ~17 exchanges (the
    * batch sub-plan recurs in digests/survivors/candidates/verify/
    * final-status), but every one of them carries BATCH-derived rows —
    * digests, exploded fingerprints, candidate id pairs, statuses.
    * History-sized data never enters an exchange, which is why
    * measured ingest cost stays flat as the ledger grows
    * (LedgerScaleProbe, BASELINE.md). */
  def dedupAgainstLedger(batch: DataFrame, idCol: String, textCol: String,
      digTab: String, fpTab: String, setTab: String,
      tag: String, pathFor: String => String,
      threshold: Double = 0.6, buckets: Int = 8): DataFrame = {
    val s = batch.sparkSession
    val bDigTab = tag + "_batch_dig"
    batch.select(col(idCol), md5(lower(trim(col(textCol)))).as("h"))
      .write.mode("overwrite").bucketBy(buckets, "h")
      .option("path", pathFor(bDigTab)).saveAsTable(bDigTab)
    val exactHit = s.table(bDigTab)
      .join(s.table(digTab).select(col("h"), col(idCol).as("__pid")), "h")
      .groupBy(idCol).agg(min("__pid").as("__eprior"))
    val survivors = batch.join(exactHit.select(col(idCol)), Seq(idCol), "left_anti")
    val cand = portableFingerprints(survivors, idCol, textCol)
      .join(s.table(fpTab).select(col("fp"), col(idCol).as("__pid")), "fp")
      .select(col(idCol), col("__pid")).distinct()
    val bSets = withHashedShingles(withShingles(survivors, textCol), "sh")
      .select(col(idCol), col("shs").as("__bshs"))
    val pSets = s.table(setTab)
      .select(col(idCol).as("__pid"), col("shs").as("__pshs"))
    val nearHit = cand
      .join(bSets, idCol)
      .join(pSets, "__pid")
      .filter(round(jaccard(col("__bshs"), col("__pshs")), 4) >= threshold)
      .groupBy(idCol).agg(min("__pid").as("__nprior"))
    batch.select(col(idCol))
      .join(exactHit, Seq(idCol), "left")
      .join(nearHit, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__eprior").isNotNull, "dup_exact")
          .when(col("__nprior").isNotNull, "dup_near")
          .otherwise("new").as("status"),
        coalesce(col("__eprior"), col("__nprior"), lit(-1L))
          .cast("long").as("matched_prior"))
  }

  /** Append the accepted (status = new) docs' keys to the ledger — the
    * write side of the incremental contract: after this, re-ingesting
    * the same batch flags every doc as a duplicate (idempotence,
    * asserted in ApiSpec). `statuses` is [[dedupAgainstLedger]]'s
    * output. */
  def appendToLedger(batch: DataFrame, idCol: String, textCol: String,
      statuses: DataFrame, digTab: String, fpTab: String,
      setTab: String, buckets: Int = 8): Unit = {
    // Materialize the accepted set ONCE, eagerly, before any append.
    // `statuses` is a lazy plan that itself reads the ledger tables; the
    // first append below mutates digTab, so re-planning `statuses` for
    // the fp/set appends would reclassify the just-appended docs as
    // dup_exact and silently append nothing to those tables (losing
    // their near-dup index entries). An EAGER truncation snapshots the
    // rows and cuts lineage so all three appends read the same frozen
    // verdicts; under a cluster checkpoint dir the snapshot is a
    // reliable checkpoint (recompute-after-executor-loss would read a
    // half-appended ledger — worse than failing), local mode keeps
    // localCheckpoint which fails loudly on block loss.
    val accepted = graft.Lineage.truncate(batch.join(
      statuses.filter(col("status") === "new").select(col(idCol)), Seq(idCol)))
    accepted.select(md5(lower(trim(col(textCol)))).as("h"), col(idCol))
      .write.mode("append").bucketBy(buckets, "h").saveAsTable(digTab)
    portableFingerprints(accepted, idCol, textCol)
      .write.mode("append").bucketBy(buckets, "fp").saveAsTable(fpTab)
    withHashedShingles(withShingles(accepted, textCol), "sh")
      .select(col(idCol), col("shs"))
      .write.mode("append").bucketBy(buckets, idCol).saveAsTable(setTab)
  }

  /** 64-bit weighted SimHash signatures of a text column. */
  def simhashSignatures(df: DataFrame, textCol: String,
      out: String = "sim"): DataFrame =
    df.withColumn("__hs", expr(s"transform(split($textCol, ' '), t -> xxhash64(t))"))
      .withColumn(out, simhash64(col("__hs")))
      .drop("__hs")

  /** Pairs of signatures within `maxHamming` via a multi-index over
    * PAIRS of bit-blocks: any signature pair within maxHamming has at
    * least two intact blocks (pigeonhole needs maxHamming ≤ blocks-2),
    * so it shares at least one intact block-pair. The combined
    * 2·width-bit keys keep candidate volume ~n²/2^(2·width) instead of
    * the single-block n²/2^width. */
  def simhashNearPairs(sigs: DataFrame, idCol: String, simCol: String,
      maxHamming: Int = 6, blocks: Int = 8): DataFrame = {
    require(maxHamming <= blocks - 2,
      "block-pair completeness needs maxHamming <= blocks - 2")
    require(64 % blocks == 0, "blocks must divide 64")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val blocked = sigs
      .select(col(idCol), col(simCol),
        posexplode(expr(
          s"""flatten(transform(sequence(0, ${blocks - 2}), i ->
             |  transform(sequence(i + 1, ${blocks - 1}), j ->
             |    named_struct('pair', i * $blocks + j,
             |      'v', shiftleft(shiftright($simCol, i * $width) & $mask, $width)
             |           | (shiftright($simCol, j * $width) & $mask)))))""".stripMargin)))
      .select(col(idCol), col(simCol),
        col("col.pair").as("pair"), col("col.v").as("bv"))
    val a = blocked.select(col(idCol).as(idCol + "_a"), col(simCol).as("__sa"),
      col("pair"), col("bv"))
    val b = blocked.select(col(idCol).as(idCol + "_b"), col(simCol).as("__sb"),
      col("pair"), col("bv"))
    a.join(b, Seq("pair", "bv"))
      .filter(col(idCol + "_a") < col(idCol + "_b"))
      .select(idCol + "_a", idCol + "_b", "__sa", "__sb").distinct()
      .withColumn("hamming", expr("bit_count(__sa ^ __sb)"))
      .filter(col("hamming") <= maxHamming)
      .select(idCol + "_a", idCol + "_b", "hamming")
  }
}
