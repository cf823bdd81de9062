package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null semantics the engine relies on: the driver tables are
  * null-free, but real pipelines aren't — these pin the behaviors the
  * operators assume. */
class NullHandlingSpec extends AnyFunSuite with SparkFixture {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def dfWithNulls = {
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = true),
      StructField("v", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, 10.0, "a"), Row(1, null, "b"), Row(null, 30.0, null),
        Row(2, 40.0, "a"), Row(null, null, null))),
      schema)
  }

  test("aggregates skip nulls; count(*) does not") {
    val r = dfWithNulls.agg(
      count(lit(1)).as("n_rows"), count(col("v")).as("n_v"),
      sum("v").as("sum_v"), avg("v").as("avg_v")).collect()(0)
    assert(r.getLong(0) == 5 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 80.0)
    assert(math.abs(r.getDouble(3) - 80.0 / 3) < 1e-12)
  }

  test("groupBy treats null as its own key; equi-join drops null keys") {
    val groups = dfWithNulls.groupBy("k").count().collect()
      .map(r => (Option(r.get(0)), r.getLong(1))).toMap
    assert(groups(None) == 2) // both null-k rows grouped together
    val self = dfWithNulls.select("k").join(
      dfWithNulls.select(col("k").as("k2")), col("k") === col("k2"))
    // null keys never match themselves under =
    assert(self.filter(col("k").isNull).count() == 0)
  }

  test("null-safe equality <=> matches null to null") {
    val a = dfWithNulls.select(col("k").as("ka"))
    val b = dfWithNulls.select(col("k").as("kb"))
    val nsJoin = a.join(b, col("ka") <=> col("kb"))
    assert(nsJoin.filter(col("ka").isNull).count() == 4) // 2 null × 2 null
  }

  test("window lag returns null at partition start; sort nulls are ordered as asked") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v").asc_nulls_last)
    val lags = dfWithNulls.select(col("v"), lag("v", 1).over(w).as("pv"))
      .collect()
    assert(lags.head.isNullAt(1))
    val sorted = dfWithNulls.orderBy(col("v").asc_nulls_last).collect().map(r => Option(r.get(1)))
    assert(sorted.takeRight(2).forall(_.isEmpty), "nulls must sort last when asked")
    val sortedFirst = dfWithNulls.orderBy(col("v").asc_nulls_first).collect().map(r => Option(r.get(1)))
    assert(sortedFirst.take(2).forall(_.isEmpty), "nulls must sort first when asked")
  }

  test("DedupApi.exactDedup groups null texts together without crashing") {
    val got = graft.llm.DedupApi.exactDedup(
      dfWithNulls.select(col("k").cast("long").as("id"), col("s").as("body"))
        .filter(col("id").isNotNull), "id", "body")
      .collect()
    // rows: (1,"a"), (1,"b"), (2,"a") → "a" dedups across ids
    assert(got.length == 2)
    assert(got.map(_.getLong(2)).sum == 3)
  }

  test("from_json yields null row for malformed payloads, not an error") {
    import spark.implicits._
    val df = Seq("""{"k": 1}""", "not json", null).toDF("props")
    val parsed = df.select(expr("from_json(props, 'k INT')").as("p"))
      .select(col("p.k")).collect().map(r => Option(r.get(0)))
    assert(parsed(0).contains(1) && parsed(1).isEmpty && parsed(2).isEmpty)
  }
}
