package graft.streaming

import graft.operators.EventOps.{statefulFold, Event, UserStats}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming pipelines (SURVEY.md §2h, §3).
  *
  * These are the SAME transformations the batch-oracle queries in
  * `graft.operators.EventOps` run — Structured Streaming's
  * batch/stream unification is the test seam: batch results are
  * DuckDB-verified, and StreamingSpec drives these incremental
  * versions through MemoryStream asserting watermark drops, late-data
  * handling and state evolution.
  *
  * Kinesis mapping (reference class): `spark.readStream` replaces the
  * get_shard_iterator/get_records consumer loop; `checkpointLocation`
  * replaces sequence-number checkpointing (exactly-once); shard ≈
  * partition; `withWatermark` bounds consumer lag-induced lateness.
  * No Kinesis connector jar ships in this container, so sources here
  * are MemoryStream/file — the pipeline code is source-agnostic.
  */
object StreamOps {

  /** Tumbling 1h event-time counts with a 10-minute watermark:
    * state for a window is evicted once the watermark passes its end —
    * bounded state at any throughput. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1h/30m windowed sums. */
  def slidingSums(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Gap-based 30-minute session windows per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sess_start"), col("user_id"), col("n"))

  /** At-least-once consumer dedup on the record id, state bounded by
    * the watermark (the Kinesis resharding/retry story). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Arbitrary per-user running state — the same fold as the
    * batch-oracle `stream_stateful` query, run incrementally. */
  def statefulUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    implicit val statsEnc = Encoders.product[UserStats]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(statefulFold)
  }

  /** Spark 4 transformWithState seam: per-user running (count, cents)
    * via an explicit ValueState — the successor API to
    * flatMapGroupsWithState, with typed state handles and TTL support.
    * Requires the RocksDB state store provider (bundled). */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, Event, (Long, Long, Long)] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      val (n0, c0) = if (totals.exists()) totals.get() else (0L, 0L)
      val (n, c) = rows.foldLeft((n0, c0)) { case ((an, ac), e) =>
        (an + 1, ac + math.round(e.value * 100))
      }
      totals.update((n, c))
      Iterator.single((userId, n, c))
    }
  }

  /** transformWithState pipeline over the event stream. */
  def runningTotals(events: Dataset[Event]): Dataset[(Long, Long, Long)] = {
    implicit val outEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Stream-stream inner join with a time-interval condition: clicks
    * enriched with the purchase that follows within one hour, per
    * user. Both sides are watermarked so Spark can bound the join
    * state buffers — unbounded stream-stream joins are the classic
    * streaming OOM at scale; the interval + watermarks make state
    * eviction provable. */
  def streamStreamEnrich(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Run any of the above to an in-memory sink for tests/demos. */
  def startToMemory(df: DataFrame, queryName: String,
      outputMode: OutputMode = OutputMode.Append): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
}
