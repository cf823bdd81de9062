package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders keyed by scale-factor directory.
  *
  * Every query function receives `sfDir` from the driver and must build
  * its plan against that directory (SURVEY.md §3) — never a hardcoded
  * scale factor. Loaders return plain `spark.read.parquet` scans so
  * Catalyst's column pruning / predicate pushdown reach the Parquet
  * reader untouched.
  *
  * At 100 TB these would be partitioned external tables (e.g. `events`
  * partitioned by `date_trunc('day', ts)`); the loader seam is where
  * that layout knowledge lives, so query code stays layout-agnostic.
  */
object Tables {
  /** Per-JVM memo of each table path's INFERRED parquet schema — the
    * metadata a catalog-backed external table would hold (guide §6:
    * repeated file-source metadata reads are driver overhead worth
    * caching). Without it every `load` call pays a full DataSource
    * resolution INCLUDING a parquet footer-read Spark job:
    * LoadFloorProbe measures 64-112 ms per construction vs 5-6 ms
    * with the schema supplied, and the suite constructs these tables
    * ~250× per bench pass. The memo holds ONLY the StructType —
    * never rows, never a DataFrame: every query still scans the
    * parquet data in full on every action, and a fresh JVM (each
    * driver/bench invocation) re-infers from the footers, so nothing
    * is precomputed across runs. The first inference per path uses
    * whatever session conf is in force at that call (the `events`
    * loader sets its legacy-ns flag before loading, as before);
    * SchemaCanarySpec pins every loader's post-load dtypes, so a
    * memo returning anything but the per-path inference result fails
    * loud there. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** `events.ts` is nanosecond-precision parquet. Spark versions differ
    * in how they surface it: older builds refuse the type unless
    * `spark.sql.legacy.parquet.nanosAsLong` maps it to raw ns longs;
    * Spark 4.1.2 ignores that flag and reads it natively as a
    * micros-truncated `TIMESTAMP_NTZ`. Branch on the schema we actually
    * got back so both paths yield the identical session-TZ (UTC)
    * timestamp truncated to microseconds — exactly what DuckDB does on
    * read (SURVEY.md §5 determinism rules). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** One declared operator: a DataFrame program plus (optionally) the
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. `oracle = None` marks operators whose semantics ANSI SQL /
  * DuckDB cannot reproduce deterministically (approximate sketches,
  * hash-function-dependent LSH, streaming-only state) — the driver
  * records a weaker rows-only check for those (SURVEY.md §2).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
