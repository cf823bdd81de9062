package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
import org.apache.spark.sql.functions._

/** AQE skew-join A/B — the production skew lever at 100 TB, measured
  * against the engine's manual salted rewrite on a PLANTED skew:
  * one hot key holds half the fact side, so a plain sort-merge join
  * serializes half the probe on one task. Three runs on identical
  * data, results asserted row-identical:
  *
  *  1. skewJoin OFF  — the straggler baseline (one task owns the hot
  *     partition);
  *  2. skewJoin ON   — Spark's runtime re-plan splits the oversized
  *     partition into advisory-sized chunks, each joined against a
  *     duplicated copy of the build side (plan marker `skew=true`;
  *     split count read from the AQEShuffleRead metrics);
  *  3. manual SALT   — the agg_salted pattern generalized to a join:
  *     fact side salted 16 ways, build side exploded ×16, equi-join
  *     on (key, salt).
  *
  * Deployment note the numbers encode: AQE's splitter engages on
  * BYTE thresholds (skewedPartitionThresholdInBytes default 256 MB,
  * advisoryPartitionSizeInBytes 64 MB) — right-sized for real
  * executors, far above a local probe's partitions, so the probe
  * lowers both to engage the mechanism at probe scale; at deployment
  * the defaults engage by themselves. The broadcast threshold is
  * disabled for the joined pair because at 100 TB neither side of
  * this shape broadcasts — with it on, Spark would (correctly) just
  * broadcast the small build side and no skew exists to handle.
  *
  * Usage: sbt "runMain graft.tools.SkewJoinProbe [hotMillions]"
  */
object SkewJoinProbe {

  /** (wall sec, rows, sum, skewedPartitions, skewSplits, skewMarked) */
  def runJoin(left: DataFrame, right: DataFrame): (Double, Long, Long, Long, Long, Boolean) = {
    val joined = left.join(right, "k")
      .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
    val t0 = System.nanoTime()
    // collect(), not head(): head() wraps the query in a fresh
    // limit-QueryExecution, so the plan inspected below would be an
    // unexecuted clone (isFinalPlan=false, no AQE metrics)
    val row = joined.collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val plan = joined.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }.getOrElse(p)
    }
    // STRUCTURAL split accounting: a skew-split shuffle read carries
    // one PartialReducerPartitionSpec per chunk of each oversized
    // reducer partition. Spark 4 wraps every AQE stage (including the
    // final ResultQueryStageExec) with the stage's plan OUTSIDE the
    // children list, so plain collect() sees only the root — expand
    // through QueryStageExec.plan explicitly.
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: expand(q.plan)
      case _ => p +: p.children.flatMap(expand)
    }
    val nodes = expand(finalPlan)
    val (skewedParts, splits) = nodes.collect {
      case r: AQEShuffleReadExec =>
        val partial = r.partitionSpecs.collect {
          case p: org.apache.spark.sql.execution.PartialReducerPartitionSpec => p
        }
        (partial.map(_.reducerIndex).distinct.size.toLong, partial.size.toLong)
    }.foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    (sec, row.getLong(0), row.getLong(1), skewedParts, splits,
      finalPlan.toString.contains("skew=true"))
  }

  def main(args: Array[String]): Unit = {
    val hotM = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // at 100 TB neither side of this shape broadcasts
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // engage the byte-threshold splitter at probe scale (see doc)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = s"/tmp/graft_skewprobe_${spark.sparkContext.applicationId}"

    // PLANTED skew: hot key 0 carries hotM million rows (~half the
    // fact side); 100k cold keys carry the other half uniformly.
    val hot = hotM * 1000000L
    spark.range(hot).select(lit(0L).as("k"), col("id").as("lv"))
      .unionByName(spark.range(hot).select(
        (pmod(col("id"), lit(100000L)) + 1L).as("k"), col("id").as("lv")))
      .write.mode("overwrite").parquet(s"$scratch/fact")
    spark.range(100001L).select(col("id").as("k"), (col("id") * 7L).as("rv"))
      .write.mode("overwrite").parquet(s"$scratch/dim")
    val fact = spark.read.parquet(s"$scratch/fact")
    val dim = spark.read.parquet(s"$scratch/dim")

    def salted(): (Double, Long, Long) = {
      val sl = fact.withColumn("salt", pmod(col("lv"), lit(16)))
      val sr = dim.withColumn("salt", explode(expr(
        "sequence(CAST(0 AS BIGINT), CAST(15 AS BIGINT))")))
      val j = sl.join(sr, Seq("k", "salt"))
        .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
      val t0 = System.nanoTime()
      val row = j.collect()(0)
      ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(1))
    }

    // warm the IO path once
    fact.count(); dim.count()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (tOff, nOff, sOff, _, _, mOff) = runJoin(fact, dim)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (tOn, nOn, sOn, skewedParts, splits, mOn) = runJoin(fact, dim)
    val (tSalt, nSalt, sSalt) = salted()

    println(f"""{"skew_off_sec":$tOff%.2f,"skew_on_sec":$tOn%.2f,""" +
      f""""salted_sec":$tSalt%.2f,"rows":$nOff,""" +
      f""""skewed_partitions":$skewedParts,"skew_splits":$splits,""" +
      s""""plan_marked_off":$mOff,"plan_marked_on":$mOn}""")

    require(!mOff, "skewJoin disabled must not mark the join skew=true")
    require(mOn && skewedParts >= 1L && splits > skewedParts,
      s"skewJoin enabled must split the hot partition (marked=$mOn, " +
        s"skewed=$skewedParts, splits=$splits)")
    require(nOff == nOn && sOff == sOn && nOff == nSalt && sOff == sSalt,
      s"A/B/C results diverged: ($nOff,$sOff) ($nOn,$sOn) ($nSalt,$sSalt)")
    require(tOn < tOff,
      f"skew-join split must beat the straggler baseline ($tOn%.2f vs $tOff%.2f)")
    println("[skewjoin] OK")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    spark.stop()
  }
}
