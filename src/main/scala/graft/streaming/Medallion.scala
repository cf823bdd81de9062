package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** BRONZE → SILVER → GOLD: the medallion lakehouse chain, composed
  * entirely from this engine's own primitives and EXACTLY-ONCE at
  * every hop.
  *
  *  - BRONZE is a raw append-only lake table of events (any writer:
  *    [[LakeSink.appendSegment]], [[LakeSink.startCompactingIngest]]).
  *  - SILVER tails bronze through the `graft-lake-changefeed` source
  *    (manifest diffs — planning a batch reads zero data files) and
  *    folds a WATERMARKED tumbling event-time aggregate. Append output
  *    mode means a (window, event_type) row reaches foreachBatch
  *    exactly once, when the watermark proves the window closed — so
  *    the silver hop is itself append-only and a second change feed
  *    can tail it.
  *  - GOLD tails silver's change feed and folds running per-type
  *    totals via read-modify-MERGE.
  *
  * Exactly-once is end-to-end and survives a kill at ANY point:
  * the streaming checkpoint pins which bronze/silver versions each
  * batch covers (no loss), and every lake commit carries a `txn`
  * guard (appId, batchId) in the same manifest CAS as the data, so a
  * crash-replayed batch is a structural no-op (no duplication). The
  * crash window foreachBatch leaves open — lake commit succeeded,
  * checkpoint commit did not — is exactly what the `afterCommit`
  * seam injects in MedallionSpec, at both hops.
  *
  * 100 TB shape: bronze appends are the only large IO. The silver
  * fold's state is bounded by the watermark horizon (windows evict on
  * close); each silver batch appends one small segment. Gold's
  * read-modify-merge touches a table bounded by the event-type
  * cardinality, and the merge broadcasts the delta. Nothing in the
  * chain rescans bronze, ever — that is the point of the change-feed
  * hop: a consumer of a 100 TB table pays only for what changed.
  */
object Medallion {

  /** Silver rows: one per CLOSED (hour window × event_type).
    * `win_start` is epoch microseconds — the determinism rules'
    * timestamp convention. */
  val silverSchema: StructType = StructType(Seq(
    StructField("win_start", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("n", LongType, nullable = true),
    StructField("cents", LongType, nullable = true)))

  /** Gold rows: running totals per event_type over all closed windows. */
  val goldSchema: StructType = StructType(Seq(
    StructField("event_type", StringType, nullable = true),
    StructField("n", LongType, nullable = true),
    StructField("cents", LongType, nullable = true)))

  /** Create the silver and gold tables (schema-only commits), so the
    * change-feed consumers can subscribe BEFORE any data flows —
    * consumer deployment is not ordered after first ingest. */
  def initTables(silverDir: String, goldDir: String): Unit = {
    LakeSink.createTable(silverDir, silverSchema)
    LakeSink.createTable(goldDir, goldSchema)
  }

  /** The silver transformation: watermarked 1h tumbling counts and
    * exact integer cents per event_type. Shared by the stream and the
    * batch oracle (Structured Streaming's unification seam). */
  def silverAgg(bronze: DataFrame, watermark: String = "10 minutes"): DataFrame =
    bronze
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select(unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("cents"))

  /** Start the bronze→silver hop. Each micro-batch of CLOSED windows
    * lands as one silver segment, txn-guarded: a replayed batch
    * re-offers the same (appId, batchId) and the manifest refuses the
    * duplicate atomically. `afterCommit` runs after the lake commit
    * but before the streaming checkpoint commits — the kill seam. */
  def startSilver(spark: SparkSession, bronzeDir: String, silverDir: String,
      checkpointDir: String, watermark: String = "10 minutes",
      afterCommit: Long => Unit = _ => ()): StreamingQuery = {
    val bronze = spark.readStream.format("graft-lake-changefeed")
      .option("path", bronzeDir).load()
    silverAgg(bronze, watermark).writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        if (!b.isEmpty)
          LakeSink.appendSegment(b.sparkSession, silverDir, b.toDF(),
            f"seg_s$batchId%06d", txn = Some(("medallion-silver", batchId)))
        afterCommit(batchId)
      }
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** One gold fold step: aggregate the silver delta per event_type and
    * read-modify-MERGE it into the running totals. Public so a
    * crash-replay can be driven directly against the same code path. */
  def foldGold(b: Dataset[Row], batchId: Long, goldDir: String): Unit = {
    val s = b.sparkSession
    val delta = b.groupBy("event_type")
      .agg(sum("n").as("n"), sum("cents").as("cents"))
    if (!delta.isEmpty) {
      val m = LakeSink.readManifest(goldDir)
      if (m.segs.isEmpty) {
        LakeSink.appendSegment(s, goldDir, delta, "seg_g000000",
          txn = Some(("medallion-gold", batchId)))
      } else {
        val cur = LakeSink.readTable(s, goldDir)
          .withColumnRenamed("n", "cur_n")
          .withColumnRenamed("cents", "cur_cents")
        val folded = delta.join(cur, Seq("event_type"), "left_outer")
          .select(col("event_type"),
            (col("n") + coalesce(col("cur_n"), lit(0L))).as("n"),
            (col("cents") + coalesce(col("cur_cents"), lit(0L))).as("cents"))
        LakeSink.mergeInto(s, goldDir, folded, Seq("event_type"),
          txn = Some(("medallion-gold", batchId)))
      }
    }
  }

  /** Start the silver→gold hop: tail silver's change feed (silver is
    * append-only by construction, so the feed never refuses) and fold
    * running totals, txn-guarded like the silver hop. */
  def startGold(spark: SparkSession, silverDir: String, goldDir: String,
      checkpointDir: String,
      afterCommit: Long => Unit = _ => ()): StreamingQuery =
    spark.readStream.format("graft-lake-changefeed")
      .option("path", silverDir).load()
      .writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        foldGold(b, batchId, goldDir)
        afterCommit(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  // ---- CDC-MAINTAINED variant: the chain under bronze DML ----------
  // The watermark chain above assumes bronze is append-only — the
  // common case. A bronze that takes row-level DELETEs (GDPR erasure,
  // late corrections) breaks it: closed windows already folded
  // downstream would silently keep counting erased rows. This variant
  // rebuilds both hops as INCREMENTAL VIEW MAINTENANCE over the CDC
  // feed: every change row folds with a SIGN (+1 for
  // insert/update_postimage, -1 for delete/update_preimage), each
  // hop's own writes run with `cdc = true` so the NEXT hop sees its
  // changes the same way, and a window whose count reaches zero is
  // physically deleted. One bronze DELETE thus propagates
  // bronze → silver → gold touching only the changed rows — no
  // rescan, no rebuild, and the erased user is gone from every
  // derived table. Exactly-once: merges are txn-guarded as before;
  // the zero-row cleanup is idempotent on replay (nothing left to
  // delete). There is no watermark: windows never "close", they
  // converge — the trade for correcting history is that silver rows
  // are upserted, not append-final (which is exactly why the hops
  // talk CDC, not the append-only feed).

  /** Signed (window × type) delta of one bronze CDC micro-batch. */
  private def signedWindowDelta(b: Dataset[Row]): DataFrame =
    b.withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(sum(col("__sign")).as("dn"),
        sum(col("__sign") *
          expr("CAST(round(value * 100) AS BIGINT)")).as("dcents"))
      .select(unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("dn"), col("dcents"))

  /** One CDC silver fold: merge the signed delta into the rollup,
    * then drop rows whose count reached zero. Public for replay
    * tests. */
  def foldSilverCdc(b: Dataset[Row], batchId: Long,
      silverDir: String): Unit = {
    val s = b.sparkSession
    val delta = signedWindowDelta(b)
    if (!delta.isEmpty) {
      // No explicit replay check: append/merge carry their own txn
      // guard (a replayed batch's stale `folded` is computed but never
      // committed), and the zero-row cleanup below must run EVEN on
      // replay — a crash between the merge commit and the cleanup
      // would otherwise leave zero-count rows forever.
      val m = LakeSink.readManifest(silverDir)
      if (m.segs.isEmpty) {
        LakeSink.appendSegment(s, silverDir,
          delta.filter(col("dn") =!= 0L)
            .select(col("win_start"), col("event_type"),
              col("dn").as("n"), col("dcents").as("cents")),
          f"seg_s$batchId%06d",
          txn = Some(("medallion-silver-cdc", batchId)))
      } else {
        val cur = LakeSink.readTable(s, silverDir)
          .withColumnRenamed("n", "cur_n")
          .withColumnRenamed("cents", "cur_cents")
        val folded = delta
          .join(cur, Seq("win_start", "event_type"), "left_outer")
          .select(col("win_start"), col("event_type"),
            (col("dn") + coalesce(col("cur_n"), lit(0L))).as("n"),
            (col("dcents") + coalesce(col("cur_cents"), lit(0L)))
              .as("cents"))
        LakeSink.mergeInto(s, silverDir, folded,
          Seq("win_start", "event_type"),
          txn = Some(("medallion-silver-cdc", batchId)), cdc = true)
        // fully-erased windows leave the table (idempotent on replay)
        LakeSink.deleteWhere(s, silverDir, col("n") === 0L, cdc = true)
      }
    }
  }

  /** One CDC gold fold: signed per-type totals from silver's change
    * rows (silver's merges/deletes ran with cdc, so its feed carries
    * them). */
  def foldGoldCdc(b: Dataset[Row], batchId: Long,
      goldDir: String): Unit = {
    val s = b.sparkSession
    val delta = b.withColumn("__sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy("event_type")
      .agg(sum(col("__sign") * col("n")).as("dn"),
        sum(col("__sign") * col("cents")).as("dcents"))
      .filter(col("dn") =!= 0L || col("dcents") =!= 0L)
    if (!delta.isEmpty) {
      val m = LakeSink.readManifest(goldDir)
      if (m.segs.isEmpty) {
        LakeSink.appendSegment(s, goldDir,
          delta.select(col("event_type"), col("dn").as("n"),
            col("dcents").as("cents")),
          "seg_g000000", txn = Some(("medallion-gold-cdc", batchId)))
      } else {
        val cur = LakeSink.readTable(s, goldDir)
          .withColumnRenamed("n", "cur_n")
          .withColumnRenamed("cents", "cur_cents")
        val folded = delta.join(cur, Seq("event_type"), "left_outer")
          .select(col("event_type"),
            (col("dn") + coalesce(col("cur_n"), lit(0L))).as("n"),
            (col("dcents") + coalesce(col("cur_cents"), lit(0L)))
              .as("cents"))
        LakeSink.mergeInto(s, goldDir, folded, Seq("event_type"),
          txn = Some(("medallion-gold-cdc", batchId)), cdc = true)
        // cdc = true like foldSilverCdc's cleanup: every gold write must
        // record change data, or gold's own feed becomes unreadable
        // (loud refusal) across any version where a type's totals
        // reached zero.
        LakeSink.deleteWhere(s, goldDir, col("n") === 0L, cdc = true)
      }
    }
  }

  /** Start the CDC bronze→silver hop. */
  def startSilverCdc(spark: SparkSession, bronzeDir: String,
      silverDir: String, checkpointDir: String,
      afterCommit: Long => Unit = _ => ()): StreamingQuery =
    spark.readStream.format("graft-lake-changefeed")
      .option("path", bronzeDir).option("readChangeFeed", "true").load()
      .writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        foldSilverCdc(b, batchId, silverDir)
        afterCommit(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Start the CDC silver→gold hop. */
  def startGoldCdc(spark: SparkSession, silverDir: String,
      goldDir: String, checkpointDir: String,
      afterCommit: Long => Unit = _ => ()): StreamingQuery =
    spark.readStream.format("graft-lake-changefeed")
      .option("path", silverDir).option("readChangeFeed", "true").load()
      .writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        foldGoldCdc(b, batchId, goldDir)
        afterCommit(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
