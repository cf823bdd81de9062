package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Relational operators: small exact fixtures + physical-plan shape
  * assertions (SURVEY.md §5.3: broadcast chosen, filters pushed,
  * columns pruned). */
class RelationalSpec extends AnyFunSuite with SparkFixture {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("every declared query returns rows at sf0.001") {
    // rows>0 guards against predicates that silently select nothing
    // at other scale factors than the verified sf0.01.
    val allowEmpty = Set.empty[String]
    SparkEntry.allDefs.foreach { q =>
      val n = q.fn(spark, sfDir).count()
      assert(n > 0 || allowEmpty(q.name), s"${q.name} returned 0 rows at sf0.001")
    }
  }

  test("driver entry smoke: flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query/oracle name sets are consistent") {
    val qn = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qn))
    assert(SparkEntry.allDefs.map(_.name).distinct.size == SparkEntry.allDefs.size,
      "duplicate query names")
  }

  test("join_broadcast compiles to BroadcastHashJoin") {
    val plan = run("join_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "dim join must not sort-merge")
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val plan = run("filter_pred").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("PushedFilters: [IsNotNull"), plan.take(2000))
  }

  test("scan_projected prunes to the selected columns") {
    val plan = run("scan_projected").queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"))
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads pruned column: $readSchema")
  }

  test("topk_global compiles to TakeOrderedAndProject (no global sort)") {
    val plan = run("topk_global").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("agg_groupby uses two-phase hash aggregation") {
    val plan = run("agg_groupby").queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(plan.contains("partial_"), "missing map-side partial aggregation")
  }

  test("inner join equivalence on a crafted fixture") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val r = Seq((2, "x"), (3, "y"), (4, "z")).toDF("k", "rv")
    val got = l.join(r, "k").orderBy("k").collect().map(r0 => (r0.getInt(0), r0.getString(1), r0.getString(2)))
    assert(got.toSeq == Seq((2, "b", "x"), (3, "c", "y")))
  }

  test("left anti join keeps only unmatched rows") {
    import spark.implicits._
    val l = Seq(1, 2, 3, 4).toDF("k")
    val r = Seq(2, 4).toDF("k")
    val got = l.join(r, Seq("k"), "left_anti").orderBy("k").as[Int].collect()
    assert(got.toSeq == Seq(1, 3))
  }

  test("full outer join keeps both unmatched sides") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((2, "x"), (3, "y")).toDF("k", "rv")
    val got = l.join(r, Seq("k"), "full").orderBy("k").collect()
    assert(got.length == 3)
    assert(got(0).getString(2) == null && got(2).getString(1) == null)
  }

  test("rollup produces subtotals and a grand total") {
    import spark.implicits._
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3)).toDF("g1", "g2", "v")
    val got = df.rollup("g1", "g2").agg(sum("v").as("s")).collect()
    assert(got.length == 6) // 3 leaves + 2 g1 subtotals + 1 grand
    val grand = got.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getLong(2) == 6L)
  }

  test("set ops: union/intersect/except algebra on fixtures") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(3, 4).toDF("k")
    assert(a.unionByName(b).count() == 5)
    assert(a.intersect(b).as[Int].collect().toSeq == Seq(3))
    assert(a.except(b).orderBy("k").as[Int].collect().toSeq == Seq(1, 2))
  }

  test("union-all count additivity against real tables") {
    val c = Tables.customer(spark, sfDir).count()
    val s = Tables.supplier(spark, sfDir).count()
    assert(run("set_union_all").count() == c + s)
  }

  test("pivot matrix row sums equal daily totals") {
    val piv = run("agg_pivot")
    val cols = Seq("click", "error", "purchase", "signup", "view")
    val rowSums = piv.select(
      col("day_epoch"),
      cols.map(col).reduce(_ + _).as("total")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"))
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rowSums == daily)
  }

  test("percentiles are ordered and within the value domain") {
    run("agg_percentile").collect().foreach { r =>
      val (p50, p95, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p95 && p95 <= p99)
      assert(p50 > 0 && p99 <= 500.0)
    }
  }

  test("kinesis envelope decode round-trips the payload") {
    import spark.implicits._
    val df = Seq((1L, 5L, """{"k": 42}""")).toDF("event_id", "user_id", "props")
    val enc = df.select(col("user_id"),
      base64(col("props").cast("binary")).as("data"))
    val dec = enc.select(col("user_id"),
      get_json_object(unbase64(col("data")).cast("string"), "$.k")
        .cast("int").as("k")).collect()(0)
    assert(dec.getLong(0) == 5L && dec.getInt(1) == 42)
  }

  test("theta band join assigns every event exactly once") {
    val n = Tables.events(spark, sfDir).count()
    val banded = run("join_range_theta")
      .agg(sum("n")).collect()(0).getLong(0)
    assert(banded == n, "bands must partition the value domain")
  }

  test("join_bucketed joins co-located buckets without a shuffle") {
    // Force the sort-merge path (at test scale Catalyst would broadcast)
    // to prove the bucketed scans satisfy the join's distribution: the
    // only exchange left is the final groupBy's.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = run("join_bucketed").queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 1,
        s"expected no join-input exchange (only the aggregate's), got $exchanges:\n" +
          plan.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("merge_upsert applies updates and appends inserts") {
    val base = Tables.orders(spark, sfDir)
    val nBase = base.count()
    val nChanged = base.filter(col("o_orderkey") % 100 === 0).count()
    val merged = run("merge_upsert").cache()
    try {
      assert(merged.count() == nBase + nChanged, "inserts must append")
      assert(merged.filter(col("status") === "U").count() == nChanged)
      assert(merged.filter(col("status") === "N").count() == nChanged)
      // an updated row carries exactly +100000 cents over its base price
      val k = base.filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc0"))
      val diff = merged.filter(col("status") === "U")
        .join(k, "o_orderkey")
        .filter(col("price_cents") =!= col("pc0") + 100000L).count()
      assert(diff == 0, "update must add exactly 100000 cents")
    } finally merged.unpersist()
  }

  test("stream_stream_join deltas stay inside the 30-minute band") {
    val rows = run("stream_stream_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val delta = r.getLong(2)
      assert(delta >= 0 && delta < 1800, s"delta_sec $delta outside [0, 1800)")
    }
  }

  test("csv_roundtrip equals the direct parquet aggregate") {
    val viaCsv = run("csv_roundtrip").collect().map(_.toSeq)
    val direct = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"),
        min(unix_timestamp(col("o_orderdate"))).as("first_epoch"),
        max(unix_timestamp(col("o_orderdate"))).as("last_epoch"))
      .orderBy("o_orderstatus").collect().map(_.toSeq)
    assert(viaCsv.toSeq == direct.toSeq, "CSV round trip must be lossless")
  }

  test("unpivot_stack is the inverse of the wide aggregate") {
    val long = run("unpivot_stack").collect()
    assert(long.length % 3 == 0, "three metric rows per flag")
    val metrics = long.map(_.getString(1)).distinct.sorted
    assert(metrics.toSeq == Seq("disc_cents", "price_cents", "qty_sum"))
  }

  test("HLL sketch union of disjoint shards equals the whole-corpus sketch") {
    // The property that makes sketches the incremental-uniques plan:
    // register-wise max merge means estimating union(shard sketches)
    // is EXACTLY estimating the whole-corpus sketch — not just close.
    val ev = Tables.events(spark, sfDir).select(col("user_id"))
    val whole = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .collect()(0).getLong(0)
    val merged = ev
      .withColumn("shard", col("user_id") % 2)
      .groupBy("shard").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("e"))
      .collect()(0).getLong(0)
    assert(merged == whole,
      s"merged-shard estimate $merged must equal whole-corpus estimate $whole")
    // and the estimate is a real estimate of the exact count (rsd at
    // lgConfigK=12 is ~1.6%; 5% is a safe deterministic bound here)
    val exact = ev.distinct().count()
    assert(math.abs(merged - exact) <= exact * 0.05)
  }

  test("agg_percentile_approx stays within tolerance of the exact variant") {
    val rows = run("agg_percentile_approx").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(4)),
      "every group's approx percentile must sit inside the exact φ±0.03 rank bracket")
  }

  test("agg_percentile group-size guard fails loudly past the cap") {
    // The exact-percentile plan buffers each group's full value
    // multiset; the guard must refuse to launch (not OOM later) when
    // any group exceeds the cap. cap=1 makes the real table oversized.
    val e = intercept[IllegalArgumentException] {
      graft.operators.EventOps.exactPercentileGuard(spark, sfDir, cap = 1L)
    }
    assert(e.getMessage.contains("agg_percentile_approx"),
      s"guard message must point at the scale path: ${e.getMessage}")
    // and the default cap admits the test corpus (query still runs)
    assert(run("agg_percentile").count() > 0)
  }

  test("agg_approx_topk oracle precondition: per-group cardinality within sketch capacity") {
    // approx_top_k's estimates are exact only while each group's
    // distinct-user cardinality stays within the 8192 sketch capacity
    // (the query's oracle asserts estimates_exact = TRUE). Assert the
    // precondition directly so an SF bump fails HERE, with a message
    // naming the bound, instead of as an opaque oracle hash mismatch.
    val maxCard = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("c"))
      .agg(max("c")).collect()(0).getLong(0)
    assert(maxCard <= 8192L,
      s"largest event_type has $maxCard distinct users > 8192 sketch " +
        "capacity: agg_approx_topk's estimates_exact oracle no longer holds " +
        "at this scale factor — widen the sketch or relax the oracle")
  }
}
