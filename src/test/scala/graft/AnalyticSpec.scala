package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Window functions and the as-of join on hand-computed fixtures. */
class AnalyticSpec extends AnyFunSuite with SparkFixture {

  test("row_number/rank/dense_rank on ties") {
    import spark.implicits._
    val df = Seq(("g", 10), ("g", 10), ("g", 5)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val got = df.select(
      col("v"), row_number().over(w).as("rn"),
      rank().over(w).as("rk"), dense_rank().over(w).as("drk"))
      .orderBy("rn").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq((10, 1, 1, 1), (10, 2, 1, 1), (5, 3, 3, 2)))
  }

  test("lag/lead/running sum per partition") {
    import spark.implicits._
    val df = Seq((1, 1, 10), (1, 2, 20), (1, 3, 30), (2, 1, 5)).toDF("u", "t", "v")
    val w = Window.partitionBy("u").orderBy("t")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.select(col("u"), col("t"),
        lag("v", 1).over(w).as("lg"),
        lead("v", 1).over(w).as("ld"),
        sum("v").over(run).as("rs"))
      .orderBy("u", "t").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, 1, None, Some(20), 10L), (1, 2, Some(10), Some(30), 30L),
      (1, 3, Some(20), None, 60L), (2, 1, None, None, 5L)))
  }

  test("moving average frame covers exactly trailing N rows") {
    import spark.implicits._
    val df = Seq((1, 1, 2.0), (1, 2, 4.0), (1, 3, 6.0), (1, 4, 8.0), (1, 5, 10.0))
      .toDF("u", "t", "v")
    val w = Window.partitionBy("u").orderBy("t").rowsBetween(-3, Window.currentRow)
    val got = df.select(avg("v").over(w)).orderBy("u").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(2.0, 3.0, 4.0, 5.0, 7.0))
  }

  test("topk_per_group returns at most K rows per group, correctly ranked") {
    val got = SparkEntry.queries("topk_per_group")(spark, sfDir).collect()
    val perGroup = got.groupBy(_.getInt(0))
    assert(perGroup.values.forall(_.length <= 3))
    perGroup.values.foreach { rows =>
      val bals = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(bals.toSeq == bals.sortBy(-(_: Double)).toSeq, "not descending")
    }
  }

  test("as-of join picks the latest earlier row per key") {
    import spark.implicits._
    // orders: (cust, day, orderkey) ; events: (user, day, eventId)
    val orders = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 15L, 200L))
      .toDF("k", "t", "o_orderkey")
    val events = Seq((1L, 15L, 1000L), (1L, 25L, 1001L), (2L, 14L, 2000L), (2L, 15L, 2001L))
      .toDF("k", "t", "event_id")
    val o = orders.select(col("k"), col("t"), lit(0).as("side"), col("o_orderkey"),
      lit(null).cast("long").as("event_id"))
    val e = events.select(col("k"), col("t"), lit(1).as("side"),
      lit(null).cast("long").as("o_orderkey"), col("event_id"))
    val w = Window.partitionBy("k").orderBy(col("t").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = o.unionByName(e)
      .withColumn("m", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select("event_id", "m").orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq == Seq(
      (1000L, Some(100L)),  // after day 10, before day 20
      (1001L, Some(101L)),  // after day 20
      (2000L, None),        // before any order for user 2
      (2001L, Some(200L)))) // same-day order matches (>=)
  }

  test("join_asof matches every event at sf0.001 (orders all precede events)") {
    val df = SparkEntry.queries("join_asof")(spark, sfDir)
    assert(df.filter(col("o_orderkey").isNull).count() == 0)
    assert(df.count() == Tables.events(spark, sfDir).count())
  }

  test("ntile quartiles are balanced") {
    val got = SparkEntry.queries("win_ntile_pct")(spark, sfDir)
      .groupBy("quartile").count().orderBy("quartile").collect()
    val counts = got.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, counts.mkString(","))
  }
}
