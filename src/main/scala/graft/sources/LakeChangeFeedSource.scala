package graft.sources

import graft.streaming.LakeSink
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `graft-lake-changefeed` — a STREAMING SOURCE over the lake's
  * manifest log, the Delta-source analog: a downstream pipeline
  * `readStream`s the lake table and receives each committed version's
  * APPENDED segments as one micro-batch, exactly once, resuming from
  * the checkpoint across restarts.
  *
  *  - offset   = the committed MANIFEST VERSION (one monotone long —
  *    the manifest is the log, so the log position is the offset).
  *  - batch    = [[LakeSink.changesBetween]](fromV, toV]: a pure
  *    manifest diff resolves the delta segments with zero data IO,
  *    then the engine's own parquet scan reads them — the source
  *    plans, Spark reads. Implemented on the v1 `Source` API
  *    precisely because `getBatch` returns a real DataFrame, letting
  *    the micro-batch reuse the native columnar parquet path instead
  *    of hand-rolling a row reader (the same structure
  *    FileStreamSource has; [[PlanBridge.asStreamingFrame]] marks the
  *    per-batch frame streaming, as the API requires).
  *  - contract = append-only, inherited from `changesBetween`: a
  *    copy-on-write DML or compaction inside an unconsumed window
  *    fails the stream loudly rather than re-emitting rewritten
  *    copies of old rows (Delta's source has the same default —
  *    `ignoreChanges`-style reprocessing is an explicit opt-in that
  *    this engine deliberately does not silently default to).
  *    Consumers resume past a DML boundary by restarting from a fresh
  *    checkpoint (reprocess) or diffing snapshots via
  *    `readTableAsOf`. The vacuum retention horizon bounds how far
  *    behind a checkpoint may fall.
  *  - `readChangeFeed=true` (r11) switches to CDC mode: batches carry
  *    `_change_type`/`_commit_version`, DML versions stream as their
  *    recorded change rows ([[LakeSink.changesCdcBetween]]) instead
  *    of failing, and compaction (`dataChange=false`) is invisible —
  *    the mode a derived-view maintainer uses to follow a table that
  *    takes deletes (LakeCdcSpec, Medallion.startSilverCdc).
  *  - `startingVersion=<v>` starts a FRESH consumer at the feed
  *    position after `v` instead of a whole-table snapshot; ignored
  *    once a checkpoint exists.
  *
  * At 100 TB the properties that matter: per-trigger planning cost is
  * one manifest read (no listing of millions of files — the failure
  * mode of file-glob streaming sources), the data path is the same
  * pruned columnar scan as batch, and a consumer group's progress is
  * just a version number in its checkpoint.
  *
  * Schema contract: the stream's schema is fixed at start (the
  * engine's rule for every source). A mid-stream ADD COLUMN commits
  * fine on the lake side, but batches after it carry the wider frame
  * and the query fails on the mismatch — restart the stream to pick
  * up the new schema (Delta's source has the same restart-on-
  * evolution behavior). The checkpointed version survives the
  * restart, so no data is lost or repeated.
  */
class LakeChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake-changefeed"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val dir = LakeChangeFeedSource.path(parameters)
    val m = LakeSink.readManifest(dir)
    // Subscribe-before-data: a CREATE-TABLE'd lake (schema recorded in
    // the manifest, zero segments) is a valid subscription target —
    // the stream idles (getOffset None) until the first data commit.
    // Only a lake with NEITHER data NOR a recorded schema is refused:
    // there is nothing to derive a schema from.
    require(m.segs.nonEmpty || m.schemaJson.isDefined,
      s"graft-lake-changefeed: lake at $dir has no committed segments " +
        "and no recorded schema — create the table or commit data first")
    val base = LakeSink.tableSchema(sqlContext.sparkSession, dir, m)
    (s"graft-lake-changefeed:$dir",
      if (LakeChangeFeedSource.cdcMode(parameters))
        LakeChangeFeedSource.withCdcColumns(base)
      else base)
  }

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new LakeChangeFeedSource(sqlContext.sparkSession,
      LakeChangeFeedSource.path(parameters),
      parameters.get("maxVersionsPerTrigger").map(_.toLong)
        .getOrElse(Long.MaxValue),
      LakeChangeFeedSource.cdcMode(parameters),
      parameters.get("startingVersion").map(_.trim.toLong))
}

object LakeChangeFeedSource {
  private[sources] def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-lake-changefeed requires a path option"))

  /** `readChangeFeed=true` switches the source to CDC mode (Delta's
    * option of the same name): batches carry `_change_type` +
    * `_commit_version` and DML versions stream as their recorded
    * change rows instead of failing the append-only contract. */
  private[sources] def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.trim.toBoolean)

  private[sources] def withCdcColumns(base: StructType): StructType =
    base.add("_change_type", org.apache.spark.sql.types.StringType)
      .add("_commit_version", org.apache.spark.sql.types.LongType)
}

class LakeChangeFeedSource(spark: SparkSession, dir: String,
    maxVersionsPerTrigger: Long = Long.MaxValue,
    cdc: Boolean = false,
    startingVersion: Option[Long] = None) extends Source {
  require(maxVersionsPerTrigger >= 1L,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")
  require(startingVersion.forall(_ >= 0L),
    s"startingVersion must be >= 0, got $startingVersion")

  override val schema: StructType = {
    val base = LakeSink.tableSchema(spark, dir, LakeSink.readManifest(dir))
    if (cdc) LakeChangeFeedSource.withCdcColumns(base) else base
  }

  /** Highest version this source has admitted or seen committed —
    * the base the per-trigger cap advances from. In-memory state, but
    * RESTART-SAFE: on restart the engine replays the checkpointed
    * batch range through [[getBatch]] before asking for a new offset
    * (MicroBatchExecution.populateStartOffsets makes that catch-up
    * call for committed batches too), and getBatch seeds this from
    * the restored end offset — so the backlog accumulated while a
    * consumer was DOWN (exactly the situation admission control
    * exists for) drains as capped micro-batches from the checkpointed
    * position, never as one unbounded gulp. admittedV == 0 therefore
    * means a genuinely FRESH start, whose first batch is the initial
    * whole-table snapshot — uncapped by design, since a snapshot's
    * volume is the table's, not the version count's. */
  @volatile private var admittedV: Long = 0L

  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit =
    end match {
      case l: LongOffset => admittedV = math.max(admittedV, l.offset)
      case other => admittedV =
        math.max(admittedV, other.json().trim.toLong)
    }

  /** Tip of the log = current committed manifest version, ADMISSION-
    * CAPPED at `admittedV + maxVersionsPerTrigger` — a backlog of
    * lake commits drains as a sequence of bounded micro-batches (the
    * `get_records` Limit / `maxFilesPerTrigger` semantic). None until
    * the first commit (no data yet). */
  override def getOffset: Option[Offset] = {
    val m = LakeSink.readManifest(dir)
    // No data segments: either a never-written lake or a CREATE-
    // TABLE'd one whose commits so far are metadata-only — idle until
    // the first data commit (an offset must land on a version the
    // initial snapshot can read).
    if (m.segs.isEmpty) return None
    val capped =
      if (admittedV == 0L || maxVersionsPerTrigger == Long.MaxValue) m.version
      else math.min(m.version, admittedV + maxVersionsPerTrigger)
    admittedV = math.max(admittedV, capped)
    Some(LongOffset(capped))
  }

  /** Restart hands back offsets as SerializedOffset; LongOffset's json
    * is the bare number, so parsing json() covers both shapes. */
  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(version).getOrElse(0L)
    val toV = version(end)
    // Seed the admission base from whatever range the engine hands us:
    // on restart this is the CHECKPOINTED batch (populateStartOffsets'
    // catch-up call replays it through here before the first new
    // getOffset), so the per-trigger cap applies from the restored
    // position instead of letting the first post-restart batch gulp
    // the whole downtime backlog.
    admittedV = math.max(admittedV, toV)
    // INITIAL LOAD is a SNAPSHOT of the admitted version, not a
    // change-feed walk from v0: a mature lake has DML/compaction in
    // its history (v0..tip is not append-only) and vacuumed early
    // manifests — a manifest diff from the beginning would refuse or
    // fail on exactly the lakes worth streaming. The snapshot needs
    // only toV's own manifest, and equals the v0-diff on the pure
    // append-only case. Delta's source starts the same way (snapshot,
    // then deltas). Incremental batches stay manifest diffs with the
    // append-only contract.
    //
    // `startingVersion` (Delta's option): a fresh consumer that wants
    // the FEED from a known version instead of a snapshot — its first
    // batch is the changes (startingVersion, toV], and the normal
    // incremental contract applies from there. Only consulted on the
    // fresh-start batch; after a checkpoint exists, fromV wins.
    // `startingVersion=0` is NOT "unset": it means the full change
    // history from the beginning (deletes included), so the
    // explicitly-set case is tracked apart from its value — only an
    // ABSENT option takes the snapshot initial load.
    val (effFrom, initialSnapshot) =
      if (fromV != 0L) (fromV, false)
      else startingVersion match {
        case Some(v) => (v, false)
        case None => (0L, true)
      }
    PlanBridge.asStreamingFrame(
      if (cdc) {
        import org.apache.spark.sql.functions.lit
        // initial load: the snapshot's rows ARE the inserts as of toV
        // (Delta CDF's startingVersion-at-snapshot semantics); column
        // order normalized to the declared schema either way
        val df =
          if (initialSnapshot) LakeSink.readTableAsOf(spark, dir, toV)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(toV))
          else LakeSink.changesCdcBetween(spark, dir, effFrom, toV)
        df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
          .toSeq: _*)
      }
      else if (initialSnapshot) LakeSink.readTableAsOf(spark, dir, toV)
      else LakeSink.changesBetween(spark, dir, effFrom, toV))
  }

  override def stop(): Unit = ()
  override def toString: String = s"LakeChangeFeedSource[$dir]"
}
