package graft.tools

import graft.Tables
import graft.llm.BpeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE-trainer scale-up probe, two load shapes:
  *
  * 1. CORPUS growth, fixed vocabulary (replicas unsalted — more
  *    occurrences of the same words, the real-world shape): the
  *    one-time word-frequency reduction grows with the corpus, but
  *    every merge ROUND runs on the dictionary, whose size is
  *    unchanged — so round cost must stay FLAT. The learned merges
  *    must also be IDENTICAL at every factor (the argmax is invariant
  *    under uniform frequency scaling, ties included) — asserted, a
  *    correctness check the timing rides on.
  *
  * 2. VOCABULARY growth (every word salted per copy): the dictionary
  *    itself grows ×f, so per-round pair counting grows ~linearly —
  *    the adversarial control proving the probe measures dictionary
  *    size, not luck.
  *
  * Usage: sbt "runMain graft.tools.BpeScaleProbe [maxFactor] [merges]"
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxF = if (args.nonEmpty) args(0).toInt else 16
    val nMerges = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")

    val scratch = s"/tmp/graft_bpeprobe_${spark.sparkContext.applicationId}"
    def materialize(df: DataFrame, tag: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$scratch/$tag")
      spark.read.parquet(s"$scratch/$tag")
    }

    var mergesAt1: Seq[BpeOps.Merge] = Nil
    println("-- shape 1: corpus grows, vocabulary fixed --")
    Seq(1, 4, maxF).distinct.foreach { f =>
      val df = materialize(
        (0 until f).map(i => docs.withColumn("doc_id",
          col("doc_id") + lit(i * 10_000_000L))).reduce(_ unionByName _),
        s"corpus_$f")
      BpeOps.train(df, "text", 2) // warm codegen/JIT on the same shape
      val t0 = System.nanoTime()
      val merges = BpeOps.train(df, "text", nMerges)
      val sec = (System.nanoTime() - t0) / 1e9
      if (f == 1) mergesAt1 = merges
      require(merges == mergesAt1,
        s"merges diverged at factor $f — argmax not scale-invariant:\n$merges\nvs\n$mergesAt1")
      println(f"factor=$f%2d  train($nMerges merges)=$sec%6.2f s  (merges identical: true)")
    }

    println("-- shape 2 (control): vocabulary grows with corpus --")
    Seq(1, 4, maxF).distinct.foreach { f =>
      val df = materialize(
        (0 until f).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 10_000_000L))
          // salt every WORD with (doc, copy) so the dictionary grows
          // with the corpus (the raw corpus has only 31 distinct
          // words — unsalted, the dict is trivially small at any f)
          .withColumn("text", regexp_replace(col("text"),
            lit("(\\S+)"), concat(lit(s"$$1x${i}d"), col("doc_id")))))
          .reduce(_ unionByName _),
        s"vocab_$f")
      BpeOps.train(df, "text", 2)
      val t0 = System.nanoTime()
      BpeOps.train(df, "text", nMerges)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"factor=$f%2d  train($nMerges merges)=$sec%6.2f s  (dict x$f)")
    }
    // -- shape 3 (r8): batched vs sequential rounds on a REAL vocab --
    // The driver-round-trip economics: a sequential trainer pays one
    // Spark job + one driver argmax per merge; the batched trainer
    // learns provably-independent merges together. Identity of the
    // merge tables is asserted (the batching contract), the reported
    // numbers are rounds + wall.
    println("-- shape 3: batched-merge rounds vs sequential (salted vocab) --")
    val vocabDf = materialize(
      docs.withColumn("text", regexp_replace(col("text"),
        lit("(\\S+)"), concat(lit("$1xd"), col("doc_id")))), "vocab_batch")
    Seq(64, 128).foreach { nm =>
      val t1 = System.nanoTime()
      val (seqM, seqR) = BpeOps.trainWithStats(vocabDf, "text", nm, batchK = 1)
      val seqSec = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val (batM, batR) = BpeOps.trainWithStats(vocabDf, "text", nm, batchK = 64)
      val batSec = (System.nanoTime() - t2) / 1e9
      require(batM == seqM,
        s"batched merges diverged from sequential at $nm merges")
      println(f"merges=$nm%4d  sequential: $seqR%4d rounds $seqSec%6.2f s   " +
        f"batched: $batR%3d rounds $batSec%6.2f s  (identical tables: true)")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    spark.stop()
  }
}
