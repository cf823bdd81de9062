package graft

import graft.streaming.LakeSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COMPOSITE PARTITION SPECS (r15): a table declared `PARTITIONED BY
  * (day, tenant)` records one [[LakeSink.PartVal]] fact PER DIMENSION
  * on every segment (`subs`), so the metadata-only decision ladder
  * covers predicates over ANY subset of the dimensions — the r14
  * verdict's "what's missing" #1: real event lakes partition by
  * (day × tenant) and `DELETE WHERE day < cutoff AND tenant = x`
  * must not degrade to a stats-pruned scan on the second dimension.
  * What must hold:
  *
  *  - [[LakeSink.appendPartitioned]] on a composite spec writes ONE
  *    segment per distinct value TUPLE in ONE Spark write job,
  *    records the full fact tuple plus one exact stats entry per
  *    dimension, and the table reads back exactly the input;
  *  - retention DML over both dimensions, either dimension alone, or
  *    IS NULL on a dimension is METADATA-ONLY (zero Spark jobs);
  *  - a predicate referencing a non-partition column falls back to
  *    the scan path with the identical answer;
  *  - replaceWhere with a tuple-covering predicate drops the covered
  *    segment by metadata and stages the insert with fresh composite
  *    facts (backfill stays metadata-only next time);
  *  - rewrites inherit the FULL fact tuple (delete keeps a subset;
  *    update keeps all rows unless it assigns ANY fact column);
  *  - facts round-trip the manifest line format (old single-column
  *    lines parse unchanged — backward compatible);
  *  - SHOW PARTITIONS lists every dimension.
  */
class LakePartitionMultiSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** (day BIGINT, tenant STRING, cents BIGINT) partitioned by
    * (day, tenant): days 1..3 × tenants a,b, 4 rows each. */
  private def buildLake(withNullTenant: Boolean = false): String = {
    val dir = tmp("graft_part_multi")
    import spark.implicits._
    LakeSink.createTable(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tenant",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cents",
        org.apache.spark.sql.types.LongType))),
      partitionBy = Some("day,tenant"))
    val rows = for (d <- 1 to 3; t <- Seq("a", "b"); i <- 0 until 4)
      yield (d.toLong, t, d * 100L + i)
    val df = rows.toDF("day", "tenant", "cents")
    val all = if (withNullTenant)
      df.unionByName(Seq((9L, Option.empty[String], 7L))
        .toDF("day", "tenant", "cents"))
    else df
    val (v, nSegs) = LakeSink.appendPartitioned(spark, dir, all)
    assert(v === 2L)
    assert(nSegs === (if (withNullTenant) 7 else 6))
    dir
  }

  private def jobsIn(body: => Unit): Int = {
    val sc = spark.sparkContext
    val group = "graft-jobs-" + java.util.UUID.randomUUID().toString
    sc.setJobGroup(group, group)
    try body finally sc.clearJobGroup()
    var last = -1
    var cur = sc.statusTracker.getJobIdsForGroup(group).length
    var polls = 0
    while (cur != last && polls < 50) {
      last = cur; Thread.sleep(100)
      cur = sc.statusTracker.getJobIdsForGroup(group).length
      polls += 1
    }
    cur
  }

  test("composite appendPartitioned: one segment per tuple, full fact " +
      "tuple + per-dimension exact stats, round trip") {
    val dir = buildLake()
    val m = LakeSink.readManifest(dir)
    assert(m.partSpec === Some("day,tenant"))
    assert(m.segs.size === 6)
    assert(m.parts.size === 6)
    m.parts.values.foreach { pv =>
      assert(pv.col === "day")
      assert(pv.subs.map(_._1) === Seq("tenant"))
      assert(pv.rows === 4L)
    }
    val tuples = m.parts.values
      .map(pv => (pv.value.get.toLong, pv.subs.head._2.get)).toSet
    assert(tuples === (for (d <- 1 to 3; t <- Seq("a", "b"))
      yield (d.toLong, t)).toSet)
    // one exact stats entry PER DIMENSION (file skipping on both)
    m.parts.foreach { case (seg, pv) =>
      val d = m.stats(seg)("day").asInstanceOf[LakeSink.LongStat]
      assert(d.lo === pv.value.get.toLong && d.hi === d.lo)
      val t = m.stats(seg)("tenant").asInstanceOf[LakeSink.StrStat]
      assert(t.lo === pv.subs.head._2.get && t.hi === t.lo)
    }
    val got = LakeSink.readTable(spark, dir)
    assert(got.count() === 24L)
    assert(got.filter(col("day") === 2L && col("tenant") === "b")
      .agg(sum("cents")).head.getLong(0) === (0 until 4).map(200L + _).sum)
  }

  test("retention DELETE over both dimensions: ZERO Spark jobs, exact " +
      "counts, uncovered tuples survive by reference") {
    val dir = buildLake()
    var res: (Long, Int, Int, Long) = null
    val jobs = jobsIn {
      res = LakeSink.deleteWhere(spark, dir,
        col("day") < 3L && col("tenant") === "a")
    }
    assert(jobs === 0, s"composite retention delete must plan from the " +
      s"manifest alone, launched $jobs jobs")
    val (_, rewritten, dropped, deleted) = res
    assert(rewritten === 0 && dropped === 2 && deleted === 8L)
    val left = LakeSink.readTable(spark, dir)
    assert(left.count() === 16L)
    assert(left.filter(col("tenant") === "a").agg(min("day"))
      .head.getLong(0) === 3L)
    assert(left.filter(col("tenant") === "b").count() === 12L)
  }

  test("one dimension alone still decides by metadata (either one)") {
    val dir = buildLake()
    val j1 = jobsIn {
      val (_, rw, dropped, deleted) =
        LakeSink.deleteWhere(spark, dir, col("tenant") === "b")
      assert(rw === 0 && dropped === 3 && deleted === 12L)
    }
    assert(j1 === 0, s"tenant-only predicate launched $j1 jobs")
    val j2 = jobsIn {
      val (_, rw, dropped, deleted) =
        LakeSink.deleteWhere(spark, dir, col("day") === 1L)
      assert(rw === 0 && dropped === 1 && deleted === 4L)
    }
    assert(j2 === 0, s"day-only predicate launched $j2 jobs")
    assert(LakeSink.readTable(spark, dir).count() === 8L)
  }

  test("IS NULL on a dimension is metadata-only; NULL never matches a " +
      "comparison") {
    val dir = buildLake(withNullTenant = true)
    // comparison: the NULL-tenant segment is neither dropped nor
    // scanned (decider evaluates to false on the null binding)
    val j1 = jobsIn {
      val (_, rw, dropped, _) =
        LakeSink.deleteWhere(spark, dir, col("tenant") === "zzz")
      assert(rw === 0 && dropped === 0)
    }
    assert(j1 === 0)
    val j2 = jobsIn {
      val (_, rw, dropped, deleted) =
        LakeSink.deleteWhere(spark, dir, col("tenant").isNull)
      assert(rw === 0 && dropped === 1 && deleted === 1L)
    }
    assert(j2 === 0, s"IS NULL launched $j2 jobs")
    assert(LakeSink.readTable(spark, dir).count() === 24L)
  }

  test("predicate referencing a non-partition column falls back to the " +
      "scan path with the same answer") {
    val dir = buildLake()
    val (_, rewritten, dropped, deleted) = LakeSink.deleteWhere(spark, dir,
      col("day") === 2L && col("cents") % 2L === 0L)
    assert(deleted === 4L) // 2 even cents per tenant × 2 tenants
    assert(dropped === 0 && rewritten === 2)
    val left = LakeSink.readTable(spark, dir)
    assert(left.count() === 20L)
    assert(left.filter(col("day") === 2L).count() === 4L)
    // surviving rewrites inherit the FULL fact tuple with new counts
    val m = LakeSink.readManifest(dir)
    val rewrittenSegs = m.segs.filter(_.startsWith("seg_d"))
    assert(rewrittenSegs.size === 2)
    rewrittenSegs.foreach { s =>
      val pv = m.parts(s)
      assert(pv.col === "day" && pv.value === Some("2"))
      assert(pv.subs.map(_._1) === Seq("tenant"))
      assert(pv.rows === 2L)
    }
    // …so the follow-up covered delete is metadata-only again
    val j = jobsIn {
      val (_, rw2, dropped2, deleted2) = LakeSink.deleteWhere(spark, dir,
        col("day") === 2L && col("tenant") === "a")
      assert(rw2 === 0 && dropped2 === 1 && deleted2 === 2L)
    }
    assert(j === 0, s"post-rewrite covered delete launched $j jobs")
  }

  test("replaceWhere backfill of one (day, tenant) tuple: metadata drop " +
      "+ staged insert with fresh composite facts") {
    import spark.implicits._
    val dir = buildLake()
    val fresh = Seq((2L, "b", 7777L), (2L, "b", 8888L))
      .toDF("day", "tenant", "cents")
    val (_, rewritten, dropped, deleted, inserted) =
      LakeSink.replaceWhere(spark, dir, fresh,
        Some(col("day") === 2L && col("tenant") === "b"))
    assert(rewritten === 0 && dropped === 1 && deleted === 4L &&
      inserted === 2L)
    val got = LakeSink.readTable(spark, dir)
    assert(got.count() === 22L)
    assert(got.filter(col("day") === 2L && col("tenant") === "b")
      .agg(sum("cents")).head.getLong(0) === 7777L + 8888L)
    // the staged insert carries the full tuple: the next backfill of
    // the same slice drops it by METADATA (rewritten == 0) — the only
    // jobs are the insert side's own constant staging cost (constraint
    // check + partitioned write + counts), independent of table size
    val j = jobsIn {
      val (_, rw2, dropped2, deleted2, _) =
        LakeSink.replaceWhere(spark, dir, fresh,
          Some(col("day") === 2L && col("tenant") === "b"))
      assert(rw2 === 0 && dropped2 === 1 && deleted2 === 2L)
    }
    assert(j <= 8,
      s"covered composite backfill launched $j jobs — the delete side " +
        "must not scan")
  }

  test("update keeps the fact tuple unless it assigns ANY fact column") {
    val dir = buildLake()
    // assigning a data column: facts survive on the rewrite
    LakeSink.updateWhere(spark, dir, col("day") === 1L,
      Map("cents" -> (col("cents") + 1L)))
    val m1 = LakeSink.readManifest(dir)
    val upd = m1.segs.filter(_.startsWith("seg_u"))
    assert(upd.size === 2) // (1,a) and (1,b)
    upd.foreach { s =>
      val pv = m1.parts(s)
      assert(pv.value === Some("1") && pv.subs.map(_._1) === Seq("tenant"))
    }
    // assigning the SECOND dimension: the whole tuple is forfeited
    LakeSink.updateWhere(spark, dir, col("day") === 2L,
      Map("tenant" -> lit("c")))
    val m2 = LakeSink.readManifest(dir)
    val upd2 = m2.segs.filter(s => s.startsWith("seg_u") && !upd.contains(s))
    assert(upd2.nonEmpty)
    upd2.foreach(s => assert(!m2.parts.contains(s)))
  }

  test("facts round-trip the manifest log; old single-column lines " +
      "still parse") {
    val dir = buildLake()
    // a few more commits so readManifest walks the delta log
    LakeSink.deleteWhere(spark, dir, col("day") === 1L &&
      col("tenant") === "a")
    LakeSink.deleteWhere(spark, dir, col("day") === 1L &&
      col("tenant") === "b")
    val m = LakeSink.readManifest(dir)
    assert(m.parts.size === 4)
    m.parts.values.foreach { pv =>
      assert(pv.subs.size === 1 && pv.subs.head._1 === "tenant")
    }
    // SHOW PARTITIONS lists BOTH dimensions
    val sp = LakeSink.showPartitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(sp.filter(_._1 == "day").map(_._2).toSet === Set("2", "3"))
    assert(sp.filter(_._1 == "tenant").map(_._2).toSet === Set("a", "b"))
    assert(sp.filter(_._1 == "tenant").forall(_._3 === 2L))
  }
}
