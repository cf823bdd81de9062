package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe for the bloom-prefiltered contamination check: fix
  * the training corpus (sf0.1 documents) and grow the HOLDOUT
  * (eval-suite) side 1× → 4× → 16×, measuring the recurring per-scan
  * cost.
  *
  * The 100 TB claim under test: when the holdout outgrows broadcast
  * range, folding it into a bloom filter (sized to its cardinality,
  * still ≤ a few MB — always shippable) keeps the CORPUS-side work
  * constant: every corpus gram pays one bloom probe, and only true
  * hits + false positives enter the exact verify join. So 16× holdout
  * must give ~flat corpus-scan + join time (the bloom build itself is
  * linear in holdout, amortized once per eval-suite release).
  *
  * Replica salting matches DedupScaleProbe: replicas 1..f-1 get
  * disjoint gram sets (token-salted), so holdout cardinality grows
  * linearly while the TRUE contamination hits (replica 0, unsalted
  * grams shared with the corpus) stay constant — growth adds bloom
  * pressure, not matches, which is exactly the big-holdout regime.
  *
  * Usage: sbt "runMain graft.tools.ContaminationScaleProbe [maxFactor]"
  */
object ContaminationScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxF = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge

    def grams(docs: DataFrame): DataFrame = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 4),
          |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1],
          |                 toks[i+2], toks[i+3])))""".stripMargin)).as("gram"))

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    // fixed training corpus: the sf0.1 documents as-is
    val corpusGrams = grams(base).cache()
    val nCorpusGrams = corpusGrams.count()

    // holdout replica 0 = a slice of the corpus itself (true hits);
    // replicas 1..f-1 are token-salted (disjoint grams, zero hits)
    def holdout(f: Int): DataFrame = {
      val slice = base.filter(col("doc_id") % 10 === 0)
      (0 until f).map { i =>
        if (i == 0) slice
        else slice.withColumn("text", expr(
          s"array_join(transform(split(text, ' '), t -> concat('h$i', '_', t)), ' ')"))
      }.reduce(_ unionByName _)
    }

    def run(f: Int): (Long, Long, Long, Double, Double) = {
      val hGrams = grams(holdout(f)).select("gram").distinct().cache()
      val nHold = hGrams.count()
      // bloom sized to the holdout cardinality (what the production
      // query does via a cheap count): ~10 bits/item ≈ 1% FP
      val tb0 = System.nanoTime()
      val bfBytes = hGrams.agg(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(spark, xxhash64(col("gram"))),
          Literal(math.max(65536L, nHold)),
          Literal(math.max(65536L, nHold) * 10))
          .toAggregateExpression()).as("bf"))
        .collect()(0).getAs[Array[Byte]](0)
      val buildSecs = (System.nanoTime() - tb0) / 1e9
      // recurring corpus-side cost: probe + exact verify join
      val t0 = System.nanoTime()
      val survivors = corpusGrams
        .filter(ColumnBridge.column(BloomFilterMightContain(
          Literal(bfBytes, org.apache.spark.sql.types.BinaryType),
          ColumnBridge.expression(spark, xxhash64(col("gram"))))))
      val hits = survivors
        .join(hGrams.withColumn("hit", lit(1)), Seq("gram"))
        .groupBy("doc_id").agg(count(col("hit")).as("n_shared"))
        .count()
      val scanSecs = (System.nanoTime() - t0) / 1e9
      hGrams.unpersist()
      (nHold, bfBytes.length.toLong, hits, buildSecs, scanSecs)
    }

    run(1) // warm plan shapes

    var f = 1
    while (f <= maxF) {
      val (nHold, bfBytes, hitDocs, buildSecs, scanSecs) = run(f)
      println(f"bloom  f=$f%2d corpus_grams=$nCorpusGrams%8d holdout_grams=$nHold%8d " +
        f"bloom=${bfBytes / 1024}%6d KB contaminated_docs=$hitDocs%6d " +
        f"build=$buildSecs%6.2fs scan+join=$scanSecs%6.2fs")
      f *= 4
    }
    spark.stop()
  }
}
