package graft

import graft.tools.SkewJoinProbe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling (r11): on a planted-skew join, Spark's
  * runtime re-plan must actually split the hot partition (plan marker
  * + structural PartialReducerPartitionSpec count — not just a conf
  * flag being set), and results must be identical with the handler
  * off, on, and under the manual salted rewrite. This is the spec
  * twin of graft.tools.SkewJoinProbe (which measures the wall-time
  * separation at probe scale); together they decide the deployment
  * guidance recorded in BASELINE.md: AQE subsumes manual salting for
  * JOINS, salting remains for aggregations.
  */
class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  test("planted skew: AQE splits the hot partition; off/on/salted agree") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // a join whose build side must NOT broadcast (at 100 TB it
      // wouldn't), with the byte thresholds scaled to fixture size
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      // hot key 0 = half the fact side
      val fact = spark.range(400000L)
        .select(lit(0L).as("k"), col("id").as("lv"))
        .unionByName(spark.range(400000L).select(
          (pmod(col("id"), lit(1000L)) + 1L).as("k"), col("id").as("lv")))
      val dim = spark.range(1001L)
        .select(col("id").as("k"), (col("id") * 7L).as("rv"))

      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (_, nOff, sOff, _, _, mOff) = SkewJoinProbe.runJoin(fact, dim)
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val (_, nOn, sOn, skewed, splits, mOn) = SkewJoinProbe.runJoin(fact, dim)

      assert(!mOff, "skew=true must not appear with the handler off")
      assert(mOn, "the re-planned join must carry the skew=true marker")
      assert(skewed >= 1L && splits > skewed,
        s"hot partition must be split (skewed=$skewed, splits=$splits)")

      // manual salted rewrite — identical answer
      val sl = fact.withColumn("salt", pmod(col("lv"), lit(8)))
      val sr = dim.withColumn("salt",
        explode(expr("sequence(CAST(0 AS BIGINT), CAST(7 AS BIGINT))")))
      val saltRow = sl.join(sr, Seq("k", "salt"))
        .agg(count(lit(1)), sum(col("lv") + col("rv"))).collect()(0)

      assert(nOff === nOn && sOff === sOn,
        s"skew split changed the answer: ($nOff,$sOff) vs ($nOn,$sOn)")
      assert(saltRow.getLong(0) === nOff && saltRow.getLong(1) === sOff,
        "salted rewrite changed the answer")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
