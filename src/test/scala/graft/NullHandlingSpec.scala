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

  // ------------------------------------------------------------------
  // ANSI-mode sweep (r6): Spark 4 runs ANSI by default, where invalid
  // array indexes THROW instead of returning null. Every array-index
  // site in the engine was audited; these tests pin why each is safe.
  // Sites: DedupApi.withShingles (element_at(toks, i+k)),
  // agg_percentile_approx (ex[0..2] on percentile arrays), fn_array /
  // fn_struct_map (already try_element_at since r4). DuckDB-oracle-side
  // bracket indexing (Scalars.scala oracle SQL) is DuckDB semantics
  // (NULL on OOB), not a Spark concern.
  // ------------------------------------------------------------------

  test("ANSI is on in this engine's sessions (the sweep's premise)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("ANSI sweep: withShingles never produces an out-of-bounds element_at") {
    import spark.implicits._
    // texts shorter than n, exactly n, and n+1 tokens — the boundary
    // cases where sequence(1, size-n+1) + element_at(i+k) would throw
    // under ANSI if the size>=n filter or the arithmetic were off
    val df = Seq((1L, ""), (2L, "a"), (3L, "a b"), (4L, "a b c"),
      (5L, "a b c d")).toDF("id", "text")
    val sh = graft.llm.DedupApi.withShingles(df, "text", n = 3)
      .select("id", "sh").collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(!sh.contains(1L) && !sh.contains(2L) && !sh.contains(3L)) // filtered, not thrown
    assert(sh(4L) == Seq("a b c"))
    assert(sh(5L) == Seq("a b c", "b c d"))
  }

  test("ANSI sweep: percentile-array indexes are structurally in-bounds") {
    // percentile(value, array(p1,p2,p3)) always returns a 3-element
    // array for a non-empty group, and groups only exist for rows —
    // ex[0..2] can never be OOB. Empty input → zero groups, no eval.
    val out = SparkEntry.queries("agg_percentile_approx")(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.isNullAt(1)))
    import spark.implicits._
    val empty = spark.emptyDataset[(String, Double)].toDF("event_type", "value")
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("ex"))
      .select(expr("ex[2]"))
    assert(empty.collect().isEmpty) // no groups → the index never evaluates
  }

  test("ANSI sweep: a genuinely invalid element_at DOES throw (the mode is live)") {
    import spark.implicits._
    val bad = Seq(Seq(1, 2)).toDF("a").select(expr("element_at(a, 5)"))
    assertThrows[Exception](bad.collect())
    // and the engine's sanctioned escape hatch returns null instead
    val ok = Seq(Seq(1, 2)).toDF("a").select(expr("try_element_at(a, 5)")).collect()
    assert(ok(0).isNullAt(0))
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
