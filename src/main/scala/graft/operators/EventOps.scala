package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time operators (SURVEY.md §2h), run here in batch mode over
  * the `events` table so each has a DuckDB oracle. Structured
  * Streaming's batch/stream unification means the SAME pipeline code
  * (window / session_window / dropDuplicates / flatMapGroupsWithState)
  * is what `graft.streaming.StreamOps` runs incrementally with
  * watermarks; the streaming-only semantics (late data, state
  * eviction) are covered by MemoryStream tests in StreamingSpec.
  *
  * All window keys leave as epoch-second BIGINTs, never raw ns
  * timestamps (SURVEY.md §5 determinism rules).
  */
object EventOps {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserStats(
      user_id: Long, n_events: Long, total_cents: Long, max_event_id: Long)

  /** Fixed 1-hour event-time windows via the streaming `window()`
    * primitive — identical plan shape to the incremental version. */
  private val streamTumbling = QueryDef(
    "stream_tumbling",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sc"))
        .select(
          unix_timestamp(col("window.start")).as("hour_epoch"),
          col("event_type"), col("n"),
          round(col("sc").cast("double") / 100, 2).as("sum_value"))
        .orderBy("hour_epoch", "event_type"),
    Some("""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
              event_type, CAST(count(*) AS BIGINT) AS n,
              round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type"""))

  /** Overlapping 1h windows sliding every 30m: each event lands in
    * exactly 2 buckets; the oracle reproduces the bucket assignment
    * arithmetic with a 2-row offset cross join. */
  private val streamSliding = QueryDef(
    "stream_sliding",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sc"))
        .select(
          unix_timestamp(col("window.start")).as("win_epoch"),
          col("n"),
          round(col("sc").cast("double") / 100, 2).as("sum_value"))
        .orderBy("win_epoch"),
    Some("""SELECT win_epoch, CAST(count(*) AS BIGINT) AS n,
              round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS sum_value
            FROM (
              SELECT CAST(floor(epoch(ts) / 1800) * 1800 - off AS BIGINT) AS win_epoch,
                     value
              FROM events CROSS JOIN (VALUES (0), (1800)) o(off))
            GROUP BY win_epoch ORDER BY win_epoch"""))

  /** Gap-based session windows (30 min inactivity) via the streaming
    * `session_window()` primitive; oracle = classic gaps-and-islands. */
  private val streamSession = QueryDef(
    "stream_session",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sc"))
        .select(
          col("user_id"),
          unix_timestamp(col("session_window.start")).as("sess_start"),
          col("n"),
          round(col("sc").cast("double") / 100, 2).as("sum_value"))
        .orderBy("user_id", "sess_start"),
    Some("""WITH g AS (
              SELECT user_id, event_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts, value,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
            SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
              CAST(count(*) AS BIGINT) AS n,
              round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS sum_value
            FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start"""))

  /** Watermarked daily rollup. `withWatermark` is a no-op in batch
    * execution (bounded input ⇒ nothing is late), so the oracle is the
    * plain rollup; the eviction semantics are tested in StreamingSpec. */
  private val streamWatermark = QueryDef(
    "stream_watermark",
    (s, d) =>
      Tables.events(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("day_epoch"), col("n"))
        .orderBy("day_epoch"),
    Some("""SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1 ORDER BY day_epoch"""))

  /** At-least-once delivery dedup: duplicates are manufactured by
    * replaying the whole stream (UNION ALL with itself), then dropped
    * on the record id — the Kinesis consumer-dedup semantics. */
  private val streamDedup = QueryDef(
    "stream_dedup",
    (s, d) => {
      val e = Tables.events(s, d)
      e.unionByName(e)
        .dropDuplicates("event_id")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },
    Some("""SELECT DISTINCT event_id, user_id, event_type, value
            FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
            ORDER BY event_id"""))

  /** Arbitrary per-key state via flatMapGroupsWithState (the
    * transformWithState-style seam), executed in batch: per-user fold
    * in event-time order → (count, total, last id). The fold itself is
    * the same function StreamOps runs incrementally. */
  private val streamStateful = QueryDef(
    "stream_stateful",
    (s, d) => {
      implicit val eventEnc = org.apache.spark.sql.Encoders.product[Event]
      implicit val statsEnc = org.apache.spark.sql.Encoders.product[UserStats]
      implicit val keyEnc = org.apache.spark.sql.Encoders.scalaLong
      Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Event]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[UserStats, UserStats](
          OutputMode.Append, GroupStateTimeout.NoTimeout)(statefulFold)
        .select(
          col("user_id"), col("n_events"),
          round(col("total_cents").cast("double") / 100, 2).as("total_value"),
          col("max_event_id"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS total_value,
              CAST(max(event_id) AS BIGINT) AS max_event_id
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** The per-key state transition — shared by the batch query above
    * and the MemoryStream test in StreamingSpec. */
  def statefulFold(
      userId: Long, rows: Iterator[Event],
      state: GroupState[UserStats]): Iterator[UserStats] = {
    val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0L, -1L))
    val next = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      .foldLeft(prev) { (st, e) =>
        UserStats(userId, st.n_events + 1,
          st.total_cents + math.round(e.value * 100),
          math.max(st.max_event_id, e.event_id))
      }
    state.update(next)
    Iterator.single(next)
  }

  /** Late-row detection against a per-user running watermark (max event
    * time seen so far, by arrival order, minus the 10-minute allowed
    * lateness) — the batch-checkable analog of watermark routing. */
  private val streamLate = QueryDef(
    "stream_late",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("wm", max(col("ts")).over(w) - expr("INTERVAL 10 MINUTES"))
        .select(
          col("event_id"), col("user_id"),
          (col("ts") < col("wm")).as("is_late"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
              ts < max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - INTERVAL '10 minutes' AS is_late
            FROM events ORDER BY event_id"""))

  /** Skew-resistant aggregation: stage 1 spreads each hot key over 16
    * salt buckets (map-side partials stay balanced even if one
    * event_type dominates), stage 2 merges the 16 partials per key.
    * Result is identical to the direct group-by — which is exactly
    * what the oracle checks. The salt column derives from data
    * (event_id), never rand(), so the plan stays deterministic. */
  private val aggSalted = QueryDef(
    "agg_salted",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"),
             sum(expr("CAST(round(value * 100) AS BIGINT)")).as("pc"))
        .groupBy("event_type")
        .agg(sum("pn").as("n"),
             round(sum("pc").cast("double") / 100, 2).as("sum_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              round(CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS DOUBLE) / 100, 2) AS sum_value
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** The 100 TB layout for the events table: written partitioned by
    * day, so day-ranged queries become partition pruning (only the
    * matching directory is scanned — PartitionFilters plan-asserted in
    * StreamingSpec). The oracle computes the same day-slice directly. */
  private val sinkPartitioned = QueryDef(
    "sink_partitioned",
    (s, d) => {
      val tmp = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_part_layout").toString
      Tables.events(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("day") === "2024-01-15")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE date_trunc('day', ts) = TIMESTAMP '2024-01-15'
            GROUP BY event_type ORDER BY event_type"""))

  /** Producer path: events serialized into the Kinesis put_record
    * shape — (PartitionKey, SequenceNumber, base64 Data), ordered per
    * key by sequence. Base64 is the standard alphabet on both engines,
    * so the envelope itself is oracle-checked byte-for-byte. */
  private val kinesisEncode = QueryDef(
    "kinesis_encode",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("user_id").as("partition_key"),
          col("event_id").as("sequence_number"),
          base64(col("props").cast("binary")).as("data"))
        .orderBy("partition_key", "sequence_number"),
    Some("""SELECT user_id AS partition_key, event_id AS sequence_number,
              base64(CAST(props AS BLOB)) AS data
            FROM events ORDER BY partition_key, sequence_number"""))

  /** The literal Kinesis record shape: (PartitionKey, SequenceNumber,
    * base64 Data payload). The envelope is built from events, then
    * decoded exactly as the reference's consumer loop does —
    * base64-decode → JSON-extract → keyed aggregate. The oracle runs
    * the identical encode/decode round trip in DuckDB. */
  private val kinesisDecode = QueryDef(
    "kinesis_decode",
    (s, d) => {
      val envelope = Tables.events(s, d).select(
        col("event_id").as("sequence_number"),
        col("user_id").as("partition_key"),
        base64(col("props").cast("binary")).as("data"))
      envelope
        .select(col("partition_key"),
          get_json_object(unbase64(col("data")).cast("string"), "$.k")
            .cast("int").as("k"))
        .groupBy("partition_key")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("partition_key")
    },
    Some("""SELECT user_id AS partition_key, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(json_extract_string(
                decode(from_base64(base64(CAST(props AS BLOB)))), '$.k')
                AS INTEGER)) AS BIGINT) AS sum_k
            FROM events GROUP BY user_id ORDER BY partition_key"""))

  /** Pivot: days × event types count matrix (the DataFrame `pivot`
    * operator with an explicit value list so output columns are
    * deterministic); oracle = conditional aggregation. */
  private val aggPivot = QueryDef(
    "agg_pivot",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("day_epoch", unix_timestamp(date_trunc("day", col("ts"))))
        .groupBy("day_epoch")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("day_epoch"),
    Some("""SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
              CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
              CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
              CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
              CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
              CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
            FROM events GROUP BY 1 ORDER BY day_epoch"""))

  /** Exact interpolated percentiles per key (latency-percentile style
    * reporting); Spark `percentile` and DuckDB `quantile_cont` share
    * the same interpolation definition.
    *
    * SCALE NOTE — this is the deliberately-weak correctness baseline:
    * exact `percentile` buffers each group's full value multiset in
    * the aggregation buffer, so a handful of huge groups (event_type
    * at 100 TB) OOMs an executor. The scale path is
    * [[aggPercentileApprox]] below; keep this variant for small/medium
    * groups and as the oracle anchor. A fail-loud group-size guard
    * (memoized per (session, sfDir), same pattern as TextOps'
    * block-size guard) refuses to launch when any group exceeds
    * [[maxExactPercentileGroup]] values, so no caller can buffer an
    * unbounded multiset by accident. */
  val maxExactPercentileGroup = 2000000L

  private val pctlGuardOk =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long), java.lang.Boolean]()

  private[graft] def exactPercentileGuard(s: SparkSession, d: String,
      cap: Long = maxExactPercentileGroup): Unit =
    pctlGuardOk.computeIfAbsent((s, d, cap), _ => {
      val maxGroup = Tables.events(s, d)
        .groupBy("event_type").count()
        .agg(max("count")).collect()(0).getLong(0)
      require(maxGroup <= cap,
        s"agg_percentile is the exact bounded-scale baseline: largest " +
          s"event_type group has $maxGroup values > $cap " +
          "— exact percentile buffers the full per-group multiset in the " +
          "aggregation buffer (executor OOM at corpus scale); use " +
          "agg_percentile_approx's constant-size GK sketch instead")
      java.lang.Boolean.TRUE
    })

  private val aggPercentile = QueryDef(
    "agg_percentile",
    (s, d) => {
      exactPercentileGuard(s, d)
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          expr("round(percentile(value, 0.5), 4)").as("p50"),
          expr("round(percentile(value, 0.95), 4)").as("p95"),
          expr("round(percentile(value, 0.99), 4)").as("p99"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
              round(quantile_cont(value, 0.5), 4) AS p50,
              round(quantile_cont(value, 0.95), 4) AS p95,
              round(quantile_cont(value, 0.99), 4) AS p99
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Approximate percentiles — THE 100 TB percentile plan: Spark's
    * `approx_percentile` (GK quantile summary) keeps a constant-size
    * mergeable sketch per group instead of the full value multiset, so
    * group cardinality never bounds executor memory.
    *
    * Grading honors the sketch's ACTUAL guarantee, which is on rank,
    * not value: the sketch returns a real data element whose rank is
    * within ε of the target (ε = 1/accuracy), while exact `percentile`
    * interpolates between elements — on a heavy-tailed distribution a
    * value-relative bound is simply not implied (p99 between two far
    * apart tail points diverges arbitrarily). So the boolean asserts
    * the bracket `exact(φ−0.03) ≤ approx(φ) ≤ exact(φ+0.03)` (0.03
    * covers ε + the ±1-element interpolation slack at every tested
    * SF), which DuckDB asserts as constant TRUE next to the exact
    * quantiles it computes itself. Deterministic: the sketch on a
    * fixed dataset always yields the same element. */
  private val aggPercentileApprox = QueryDef(
    "agg_percentile_approx",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          expr("approx_percentile(value, array(0.5D, 0.95D, 0.99D), 10000)")
            .as("ap"),
          expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("ex"),
          expr("percentile(value, array(0.47D, 0.92D, 0.96D))").as("lo"),
          expr("percentile(value, array(0.53D, 0.98D, 1.0D))").as("hi"))
        .select(
          col("event_type"),
          round(expr("ex[0]"), 4).as("p50_exact"),
          round(expr("ex[1]"), 4).as("p95_exact"),
          round(expr("ex[2]"), 4).as("p99_exact"),
          expr("""ap[0] BETWEEN lo[0] AND hi[0]
                  AND ap[1] BETWEEN lo[1] AND hi[1]
                  AND ap[2] BETWEEN lo[2] AND hi[2]""")
            .as("approx_within_rank_tol"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
              round(quantile_cont(value, 0.5), 4) AS p50_exact,
              round(quantile_cont(value, 0.95), 4) AS p95_exact,
              round(quantile_cont(value, 0.99), 4) AS p99_exact,
              TRUE AS approx_within_rank_tol
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** ARGMAX/ARGMIN aggregates (`max_by`/`min_by`): the who-did-it
    * companion to min/max — one partial-aggregatable pass, no window,
    * no self-join. Determinism: the comparison key is struct(value,
    * user_id), so ties on value resolve by user_id on both engines
    * (the oracle replays the same tiebreak as a row_number). */
  private val aggArgMinmax = QueryDef(
    "agg_arg_minmax",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          expr("max_by(user_id, struct(value, user_id))").as("top_user"),
          expr("min_by(user_id, struct(value, user_id))").as("bottom_user"),
          round(max("value"), 4).as("max_value"),
          round(min("value"), 4).as("min_value"))
        .orderBy("event_type"),
    Some("""WITH r AS (
              SELECT event_type, user_id, value,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY value DESC, user_id DESC) AS rtop,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY value ASC, user_id ASC) AS rbot
              FROM events)
            SELECT event_type,
              CAST(max(CASE WHEN rtop = 1 THEN user_id END) AS BIGINT) AS top_user,
              CAST(max(CASE WHEN rbot = 1 THEN user_id END) AS BIGINT) AS bottom_user,
              round(max(value), 4) AS max_value,
              round(min(value), 4) AS min_value
            FROM r GROUP BY event_type ORDER BY event_type"""))

  /** Funnel conversion (signup → click → purchase, strictly ordered
    * in event time per user): the canonical event-analytics report of
    * the reference class.
    *
    * Implemented as three chained per-user window minima over ONE
    * exchange on user_id — each stage time is a whole-partition window
    * expression referencing the previous stage's column, so
    * EnsureRequirements reuses the same hash partitioning for all
    * three windows AND the per-user aggregate (2 shuffles total; the
    * naive per-stage aggregate+join plan costs 7 — PlanAudit). */
  private val funnelConversion = QueryDef(
    "funnel_conversion",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val staged = Tables.events(s, d)
        .withColumn("t1",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") > col("t1"),
            col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
            col("ts"))).over(w))
        .groupBy("user_id")
        .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
      staged
        .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
          count(col("t3")).as("n3"))
        .selectExpr("""stack(3, '1_signup', n1, '2_click_after_signup', n2,
                             '3_purchase_after_click', n3) AS (stage, n_users)""")
        .orderBy("stage")
    },
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'signup' GROUP BY user_id),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                        JOIN s1 ON e.user_id = s1.user_id
                        WHERE e.event_type = 'click' AND e.ts > s1.t1
                        GROUP BY e.user_id),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                        JOIN s2 ON e.user_id = s2.user_id
                        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                        GROUP BY e.user_id)
            SELECT stage, n_users FROM (
              SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
              UNION ALL
              SELECT '2_click_after_signup', CAST(count(*) AS BIGINT) FROM s2
              UNION ALL
              SELECT '3_purchase_after_click', CAST(count(*) AS BIGINT) FROM s3)
            ORDER BY stage"""))

  /** Cohort retention: users bucketed by first-seen week, counted per
    * week offset they return. One shuffle on user_id gathers each
    * user's (bounded) active-week set; cohort and offsets derive from
    * it locally — no distinct+join round trip (PlanAudit: 4 exchanges
    * → 2). The per-user set is bounded by history length in weeks, so
    * collect_set stays small at any corpus size. */
  private val cohortRetention = QueryDef(
    "cohort_retention",
    (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 604800L).as("week"))
        .groupBy("user_id").agg(collect_set("week").as("weeks"))
        .withColumn("cohort_week", array_min(col("weeks")))
        .select(col("cohort_week"), explode(col("weeks")).as("week"))
        .withColumn("week_offset", col("week") - col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset"),
    Some("""WITH weekly AS (
              SELECT DISTINCT user_id,
                CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
              FROM events),
            cohort AS (
              SELECT user_id, min(week) AS cohort_week FROM weekly
              GROUP BY user_id)
            SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
              CAST(count(*) AS BIGINT) AS n_users
            FROM weekly w JOIN cohort c ON w.user_id = c.user_id
            GROUP BY c.cohort_week, week_offset
            ORDER BY cohort_week, week_offset"""))

  /** Time-series gap fill: per-type daily counts with missing days
    * zero-filled over the global span — the resample/densify step
    * every monitoring dashboard and training-curve pipeline needs
    * (a day with no events must report 0, not vanish). Shape: the
    * 2-long span row broadcasts, the (type × day) grid is generated
    * distributively via sequence+explode, the left join back to the
    * counts shuffles only (type, day, n) triples. Days travel as
    * epoch-day BIGINTs per the determinism rules. */
  private val tsGapfill = QueryDef(
    "ts_gapfill",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).as("dn"))
      val span = e.agg(min("dn").as("d0"), max("dn").as("d1"))
      val grid = e.select("event_type").distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("dn"))
      val counts = e.groupBy("event_type", "dn").agg(count(lit(1)).as("n"))
      grid.join(counts, Seq("event_type", "dn"), "left")
        .select(col("event_type"), col("dn").as("day_num"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "day_num")
    },
    Some("""WITH e AS (
              SELECT event_type,
                CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS dn
              FROM events),
            span AS (SELECT min(dn) AS d0, max(dn) AS d1 FROM e),
            grid AS (
              SELECT t.event_type, g.dn
              FROM (SELECT DISTINCT event_type FROM e) t
              CROSS JOIN (SELECT unnest(generate_series(
                (SELECT d0 FROM span), (SELECT d1 FROM span))) AS dn) g),
            counts AS (
              SELECT event_type, dn, CAST(count(*) AS BIGINT) AS n
              FROM e GROUP BY event_type, dn)
            SELECT g.event_type, g.dn AS day_num, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON g.event_type = c.event_type AND g.dn = c.dn
            ORDER BY g.event_type, day_num"""))

  /** Stream-stream interval join, batch-equivalent: each click joined
    * to the same user's purchases within the following 30 minutes. The
    * plan is an equi-join on user_id with the time band as a residual
    * predicate — one shuffle on the user key, never a time-range
    * nested loop. The incremental version (two watermarked streams,
    * state bounded by the 30-minute band) runs in StreamingSpec; this
    * is its oracle-checkable batch twin. */
  private val streamStreamJoin = QueryDef(
    "stream_stream_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          col("ts").as("bts"))
      clicks.join(buys, Seq("user_id"))
        .filter(col("bts") >= col("cts") &&
          col("bts") < col("cts") + expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("buy_id"),
          (unix_timestamp(col("bts")) - unix_timestamp(col("cts")))
            .as("delta_sec"))
        .orderBy("click_id", "buy_id")
    },
    Some("""SELECT c.event_id AS click_id, p.event_id AS buy_id,
              CAST(floor(epoch(p.ts)) AS BIGINT)
                - CAST(floor(epoch(c.ts)) AS BIGINT) AS delta_sec
            FROM events c JOIN events p ON c.user_id = p.user_id
              AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
            WHERE c.event_type = 'click' AND p.event_type = 'purchase'
            ORDER BY click_id, buy_id"""))

  /** LEFT OUTER variant of [[streamStreamJoin]]: clicks with no
    * in-band purchase survive with NULL purchase columns. In the
    * incremental version (StreamOps.streamStreamLeftOuter, tested in
    * StreamingSpec) the null row is only emitted once the watermark
    * proves the band empty; this batch twin is the end-state both
    * must agree on. Nulls sort FIRST explicitly on both engines
    * (determinism contract rule 5). */
  private val streamStreamLeft = QueryDef(
    "stream_stream_left",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("bts"))
      clicks.join(buys,
          col("user_id") === col("b_user") &&
          col("bts") >= col("cts") &&
          col("bts") < col("cts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        .select(col("click_id"), col("buy_id"),
          (unix_timestamp(col("bts")) - unix_timestamp(col("cts")))
            .as("delta_sec"))
        .orderBy(col("click_id"), col("buy_id").asc_nulls_first)
    },
    Some("""SELECT c.event_id AS click_id, p.event_id AS buy_id,
              CAST(floor(epoch(p.ts)) AS BIGINT)
                - CAST(floor(epoch(c.ts)) AS BIGINT) AS delta_sec
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id
              AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
            ORDER BY click_id, buy_id ASC NULLS FIRST"""))

  /** Stream-static enrichment, batch twin: events joined to the
    * customer dimension on user key, revenue rolled up per market
    * segment. The incremental version (StreamOps.streamStaticEnrich,
    * StreamingSpec) broadcasts the dimension into each micro-batch —
    * the stream side never shuffles, no state is kept; this batch
    * plan is literally the same join the stream re-executes per
    * batch. */
  private val streamStaticJoin = QueryDef(
    "stream_static_join",
    (s, d) => {
      Tables.events(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
             sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_c"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  val defs: Seq[QueryDef] = Seq(
    streamTumbling, streamSliding, streamSession, streamWatermark,
    streamDedup, streamStateful, streamLate, aggSalted, sinkPartitioned,
    kinesisEncode, kinesisDecode, aggPivot, aggPercentile,
    aggPercentileApprox, aggArgMinmax, funnelConversion,
    cohortRetention, tsGapfill, streamStreamJoin, streamStreamLeft,
    streamStaticJoin)
}
