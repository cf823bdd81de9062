package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation-pipeline scale-up probe: the composed
  * quality-gate → exact-dedup → rollup plan (the llm_curation_e2e
  * shape) on the documents corpus replicated 1×/4×/16× and
  * MATERIALIZED to scratch parquet (same methodology lesson as
  * JoinScaleProbe: a lazy union distorts plans). Replica texts are
  * token-salted per copy so replicas are NOT dups of each other and
  * the dedup group count grows linearly — the honest load shape.
  * Duplicate PAIRS are planted inside each copy (docs 8 and 9 of
  * every decade share a case-mangled canonical text), so
  * n_dups_removed scales exactly ×f — asserted, so the timing cannot
  * be bought with a silently-degenerate dedup.
  *
  * Pass signal: near-linear wall time (the plan is a scan and two
  * hash aggregations — no join, no window over raw input), and the
  * planted-dup invariant holding at every factor.
  *
  * Usage: sbt "runMain graft.tools.CurationScaleProbe [maxFactor]"
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxF = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val baseDocs = docs.count()

    // 24 distinct filler tokens + a per-decade token: passes both
    // curation gates (>= 20 tokens, >= 50% unique) by construction
    val seed = (1 to 24).map(i => s"w$i").mkString(" ") + " d"
    val canonical = concat(lit(seed), expr("CAST(doc_id DIV 10 AS STRING)"))
    val planted = docs.withColumn("text",
      when(col("doc_id") % 10 === 8, canonical)
        .when(col("doc_id") % 10 === 9, upper(canonical))
        .otherwise(col("text")))

    def replicated(f: Int): DataFrame =
      (0 until f).map { i =>
        planted
          .withColumn("doc_id", col("doc_id") + lit(i * 10_000_000L))
          // copy-specific token salt: replicas of a doc are NOT dups
          .withColumn("text", concat(col("text"), lit(s" copytoken$i")))
      }.reduce(_ unionByName _)

    def pipeline(df: DataFrame): org.apache.spark.sql.Row = {
      df.withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_unique",
          expr("CAST(size(array_distinct(toks)) AS BIGINT)"))
        .filter(col("n_tokens") >= 20 && col("n_unique") * 2 >= col("n_tokens"))
        .groupBy(md5(lower(trim(col("text")))).as("h"))
        .agg(min("doc_id").as("doc_id"), min("n_tokens").as("n_tokens"),
          count(lit(1)).as("n_copies"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_copies") - 1).cast("long").as("n_dups_removed"))
        .collect()(0)
    }

    val scratch = s"/tmp/graft_curprobe_${spark.sparkContext.applicationId}"
    var dupsAt1 = -1L
    Seq(1, 4, maxF).distinct.foreach { f =>
      replicated(f).write.mode("overwrite").parquet(s"$scratch/d_$f")
      val df = spark.read.parquet(s"$scratch/d_$f")
      pipeline(df) // warm
      val t0 = System.nanoTime()
      val row = pipeline(df)
      val sec = (System.nanoTime() - t0) / 1e9
      val (nDocs, nDups) = (row.getLong(0), row.getLong(1))
      if (f == 1) dupsAt1 = nDups
      require(nDups == dupsAt1 * f,
        s"planted dups $nDups != ${dupsAt1 * f} at factor $f — probe broken")
      require(nDups >= baseDocs / 10 * f,
        s"fewer dups than planted at factor $f: $nDups")
      println(f"factor=$f%2d docs=${baseDocs * f}%8d  pipeline=$sec%6.2f s" +
        f"  (${baseDocs * f / sec / 1000}%6.1f k docs/s)  dups_removed=$nDups")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    spark.stop()
  }
}
