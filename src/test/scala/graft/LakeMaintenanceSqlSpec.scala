package graft

import graft.streaming.{LakeCatalog, LakeSink}
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance DDL over registered lake tables (r11): VACUUM /
  * OPTIMIZE [CLUSTER BY | ZORDER BY] / DESCRIBE HISTORY as SQL TEXT,
  * via the injected delegating parser. What must hold: each statement
  * dispatches to its protocol op with results identical to the Scala
  * API; every OTHER statement — including these verbs over
  * unregistered names — reaches the delegate parser untouched.
  */
class LakeMaintenanceSqlSpec extends AnyFunSuite with SparkFixture {

  private def buildLake(): (String, String) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint_lake").toString
    import spark.implicits._
    (0 until 3).foreach { i =>
      val rows = (0 until 5).map(j => (i * 10L + j, (i * 10L + j) % 4))
      rows.toDF("id", "flag").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/seg_b$i")
      val m = LakeSink.readManifest(dir)
      require(LakeSink.commitManifest(dir, m.version + 1, i.toLong,
        m.segs :+ s"seg_b$i"))
    }
    val tbl = "graft_maint_" + java.lang.Long.toHexString(System.nanoTime())
    LakeCatalog.register(tbl, dir)
    (dir, tbl)
  }

  test("DESCRIBE HISTORY matches the Scala audit log") {
    val (dir, tbl) = buildLake()
    try {
      val got = spark.sql(s"DESCRIBE HISTORY $tbl")
        .orderBy("version").collect().map(_.toSeq).toSeq
      val want = LakeSink.history(spark, dir)
        .orderBy("version").collect().map(_.toSeq).toSeq
      assert(got === want)
      assert(got.size === 3)
    } finally LakeCatalog.unregister(tbl)
  }

  test("OPTIMIZE compacts to one segment without changing the rows") {
    val (dir, tbl) = buildLake()
    try {
      val before = LakeSink.readTable(spark, dir)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val r = spark.sql(s"OPTIMIZE $tbl").collect().head
      assert(r.getInt(1) === 3) // 3 input segments compacted
      val m = LakeSink.readManifest(dir)
      assert(m.segs.size === 1 && m.segs.head.startsWith("seg_c"))
      val after = LakeSink.readTable(spark, dir)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(after === before, "compaction changed table contents")
    } finally LakeCatalog.unregister(tbl)
  }

  test("OPTIMIZE ZORDER BY and CLUSTER BY parse and run") {
    val (dir, tbl) = buildLake()
    try {
      spark.sql(s"OPTIMIZE $tbl ZORDER BY (id, flag)").collect()
      assert(LakeSink.readTable(spark, dir).count() === 15)
      spark.sql(s"OPTIMIZE $tbl CLUSTER BY (id)").collect()
      assert(LakeSink.readTable(spark, dir).count() === 15)
    } finally LakeCatalog.unregister(tbl)
  }

  test("VACUUM prunes history to the retention window") {
    val (dir, tbl) = buildLake()
    try {
      spark.sql(s"OPTIMIZE $tbl").collect() // orphans the b-segments' past
      val r = spark.sql(s"VACUUM $tbl RETAIN 1 VERSIONS").collect().head
      assert(r.getInt(0) === 3, s"expected the 3 pre-compaction segment " +
        s"dirs deleted, got ${r.toSeq}")
      assert(r.getInt(1) === 3, s"expected 3 stale manifests deleted")
      assert(LakeSink.readTable(spark, dir).count() === 15)
    } finally LakeCatalog.unregister(tbl)
  }

  test("unclaimed statements reach the delegate parser untouched") {
    // normal SQL still parses and runs
    assert(spark.sql("SELECT 1 + 1").collect().head.getInt(0) === 2)
    // the maintenance verbs over an UNREGISTERED name fall through to
    // Spark's grammar, which does not have them → normal parse error
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("VACUUM definitely_not_registered")
    }
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("OPTIMIZE definitely_not_registered")
    }
  }
}
