package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PAGE-level skipping (parquet column index) — one level finer than
  * ClusteredLayoutSpec's row-group numbers: inside a SINGLE row group,
  * a sorted write gives every data page a tight min/max in the column
  * index, and a selective predicate decodes only the matching pages.
  * This is the layout lever for the regime row-group stats cannot
  * reach — a file whose one row group spans the whole key range is
  * unprunable at group level, yet sorted pages still cut decoded rows
  * by the page-count factor.
  *
  * Setup pins the regimes apart: one output file, row-group size
  * forced large (everything in one group → group-level pruning
  * impossible), page row-count forced small (many pages per group).
  * Measured as everywhere in the layout specs: FileSourceScanExec
  * `numOutputRows` ≈ rows decoded. Three probes on identical rows:
  * sorted+index (pages skip), sorted+index-disabled (control: full
  * group decoded), unsorted+index (control: every page holds the key).
  */
class PageIndexSpec extends AnyFunSuite with SparkFixture {

  private def writeLayouts(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_pageindex_spec").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val sorted = s"$base/sorted"
    val unsorted = s"$base/unsorted"
    def write(df: DataFrame, dir: String): Unit =
      df.coalesce(1)
        .write
        // one huge row group: group-level stats can never prune
        .option("parquet.block.size", (256L * 1024 * 1024).toString)
        // many small pages inside it (default limit is 20k rows —
        // the whole fixture would be one page)
        .option("parquet.page.row.count.limit", "50")
        .option("parquet.page.size", "1024")
        .mode("overwrite").parquet(dir)
    write(ev.sortWithinPartitions("user_id", "event_id"), sorted)
    write(ev, unsorted) // event order: every user everywhere
    (sorted, unsorted)
  }

  test("sorted pages skip at page level where row-group stats cannot") {
    val (sorted, unsorted) = writeLayouts()
    val total = spark.read.parquet(sorted).count()

    def probe(dir: String, indexOn: Boolean): Long =
      ScanMetrics.scanOutputRows(
        spark.read
          .option("parquet.filter.columnindex.enabled", indexOn.toString)
          .parquet(dir)
          .filter(col("user_id") === 7)
          .agg(count(lit(1)), sum("vc")))

    val pageSkip = probe(sorted, indexOn = true)
    val indexOff = probe(sorted, indexOn = false)
    val unsortedRead = probe(unsorted, indexOn = true)

    assert(spark.conf.get("spark.sql.parquet.filterPushdown") == "true")
    // Controls first: with the column index disabled, the single row
    // group is unprunable and the scan decodes (essentially) all rows;
    // same with the index on but pages unsorted.
    assert(indexOff > (total * 0.9).toLong,
      s"index-off control skipped: $indexOff of $total — row-group " +
        "layout is not the single-group setup this spec assumes")
    assert(unsortedRead > (total * 0.9).toLong,
      s"unsorted control skipped: $unsortedRead of $total")
    // The measurement: sorted pages + column index decode a small
    // fraction (the pages whose [min,max] cover user 7).
    assert(pageSkip <= total / 4,
      s"page-index skipping not happening: decoded $pageSkip of $total " +
        "rows from a sorted single-row-group file")
    // Identical answers, or the skip is a wrong-result bug.
    val a = spark.read.parquet(sorted).filter(col("user_id") === 7)
      .agg(sum("vc")).head.getLong(0)
    val b = spark.read.parquet(unsorted).filter(col("user_id") === 7)
      .agg(sum("vc")).head.getLong(0)
    assert(a == b)
    info(f"decoded: page-skip $pageSkip / index-off $indexOff / " +
      f"unsorted $unsortedRead of $total rows")
  }
}
