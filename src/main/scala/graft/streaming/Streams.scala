package graft.streaming

import graft.{QueryDef, Sql, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming slice over `events` (SURVEY.md §2.2 streaming
  * row). The transforms are written once against an unbound DataFrame so
  * the *same* logical plan runs in batch (DuckDB-oracle-verified below)
  * and as a stream (readStream file source -> watermark -> windowed agg
  * -> sink; StreamingSpec proves stream==batch on the test data).
  *
  * Scale design: tumbling/sliding windows aggregate with map-side
  * partials keyed by (window, type) — state is bounded by the watermark
  * horizon, not the stream length; sessionization state (one small
  * struct per active user) is dropped on timeout. At 100 TB/day the file
  * source becomes Kafka and nothing in the transforms changes.
  */
object Streams {

  /** Schema of the micro-batch-able events stream (ts already micros —
    * see [[Tables.events]] for the nanos quirk of the raw parquet).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour windows per event_type: batch and stream alike. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Sql.dsum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 2-hour windows every 30 minutes (stream-capable). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n_events"))

  /** Batch sessionization: 30-minute-gap sessions via lag + running sum
    * — the oracle for the stateful streaming variant below.
    */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(run).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_s"))
  }

  /** Error-context interval join: for every error event, the same user's
    * events in the 5 minutes before it. One definition serves both modes:
    * batch (the st06 oracle row) and stream-stream (pass a watermarked
    * source; both branches inherit the watermark, and the time-range
    * predicate lets Spark bound each side's buffered state to the 5-minute
    * horizon instead of keeping the whole stream).
    */
  def errorContextJoin(events: DataFrame): DataFrame = {
    val err = events.filter(col("event_type") === "error")
      .select(col("user_id").as("u"), col("event_id").as("err_id"), col("ts").as("err_ts"))
    val all = events.select(col("user_id"), col("event_id"), col("ts"))
    err.join(all,
        col("u") === col("user_id") &&
          col("ts") >= col("err_ts") - expr("INTERVAL 5 MINUTES") &&
          col("ts") < col("err_ts"))
      .select(col("err_id"), col("event_id").as("ctx_event_id"))
  }

  /** Left-outer flavor of [[errorContextJoin]]: every error emits at
    * least one row; errors with NO same-user event in the preceding 5
    * minutes surface with a NULL ctx_event_id (the fixture makes this
    * the dominant case — "error out of nowhere" is the row an alerting
    * pipeline actually wants). In streaming mode the null-padded row
    * can only be emitted once the watermark passes the error's join
    * horizon — Spark buffers the error until no matching event can
    * still arrive — so both sides MUST carry a watermark and the
    * time-range predicate bounds state exactly as in the inner form;
    * StreamingSpec proves stream==batch including the null rows.
    */
  def errorContextJoinLeftOuter(events: DataFrame): DataFrame = {
    val err = events.filter(col("event_type") === "error")
      .select(col("user_id").as("u"), col("event_id").as("err_id"), col("ts").as("err_ts"))
    val all = events.select(col("user_id"), col("event_id"), col("ts"))
    err.join(all,
        col("u") === col("user_id") &&
          col("ts") >= col("err_ts") - expr("INTERVAL 5 MINUTES") &&
          col("ts") < col("err_ts"),
        "left_outer")
      .select(col("err_id"), col("event_id").as("ctx_event_id"))
  }

  /** Stream-static enrichment join: the events stream against a static
    * customer dimension. The static side is broadcast, so each
    * micro-batch joins map-side with NO stream-side shuffle before the
    * aggregate — the canonical "enrich a 100 TB/day stream with a dim
    * table" shape. One definition serves batch (the st08 oracle row)
    * and streaming (StreamingSpec runs it on a file stream in Complete
    * mode and proves stream==batch).
    */
  def enrichedSegmentCounts(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n_events"), Sql.dsum(col("value")).as("sum_value"))

  /** Dynamic-gap session windows: each event keeps its session alive for
    * an event-dependent timeout (errors 5 minutes, everything else 30).
    * One definition serves batch (the st09 oracle row) and streaming
    * (watermarked append mode; StreamingSpec proves stream==batch with a
    * watermark-advancing sentinel).
    */
  def dynamicGapSessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), expr(
        "CASE WHEN event_type = 'error' THEN '5 minutes' ELSE '30 minutes' END")).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))

  /** Streaming admission filter — incremental dedup against a STATIC
    * historical index (p06's daily-increment shape as a stream): an
    * arriving event survives iff its key is absent from the index. The
    * index side is broadcast, so every micro-batch filters map-side with
    * no stream-side shuffle and ZERO streaming state — history is bounded
    * by the index, not by watermark-horizon state (in-horizon replays are
    * st07's dropDuplicatesWithinWatermark job; composing both gives the
    * production pipeline). One definition serves batch (the st10 oracle
    * row) and streaming (StreamingSpec proves stream==batch, append mode,
    * and asserts the broadcast in the micro-batch plan).
    */
  def admitNew(arrivals: DataFrame, seenIndex: DataFrame): DataFrame =
    arrivals.join(broadcast(seenIndex), Seq("event_id"), "left_anti")

  /** Exactly-once counts from an at-least-once feed: dedup by event_id,
    * then count per type. Streaming form uses
    * dropDuplicatesWithinWatermark (state bounded by the watermark
    * horizon); batch form uses dropDuplicates — identical results
    * whenever every replay lands within the horizon, which
    * StreamingSpec proves on a two-file replay.
    */
  def dedupCounts(events: DataFrame, streaming: Boolean = false): DataFrame = {
    val deduped =
      if (streaming) events.dropDuplicatesWithinWatermark("event_id")
      else events.dropDuplicates("event_id")
    deduped.groupBy("event_type").agg(count(lit(1)).as("n"))
  }

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class Ev2(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String)
  final case class TypeStat(user_id: Long, event_id: Long, type_count: Int,
    distinct_types: Int)

  /** Running per-type event counts + running distinct-type count per
    * user, one output row per event — the profile-enrichment stats a
    * personalization stream maintains. Batch form = two shared-sort
    * window passes (the st11 oracle row); streaming form =
    * [[TypeStatsProcessor]], the same arithmetic on a state API v2
    * `MapState[event_type, count]` (one map entry per live (user, type);
    * the map iterator is the distinct count — bounded by the type
    * vocabulary, not the stream). StreamingSpec proves stream == batch
    * across micro-batches.
    */
  def runningTypeStats(events: DataFrame): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("us"), col("event_id"))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("type_count", row_number().over(byType).cast("int"))
      .withColumn("distinct_types",
        sum(when(col("type_count") === 1, 1).otherwise(0)).over(byUser).cast("int"))
      .select("user_id", "event_id", "type_count", "distinct_types")
  }

  def runningTypeStatsStream(spark: SparkSession, events: Dataset[Ev2]): Dataset[TypeStat] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class AnomalyOut(event_type: String, event_id: Long, seq: Int,
    n_prior: Long, is_anomaly: Boolean)
  final case class Moments(n: Long, s: Long, ss: Long)

  /** Batch twin of the st22 running 3-sigma guardrail: strictly-
    * preceding window sums carry the same exact integer moments the
    * stream keeps as one (n, Σv, Σv²) triple per event_type. The flag
    * inequality runs in DECIMAL(38,0) (the squared deviation reaches
    * ~10^20 at fixture scale — past int64).
    */
  def zscoreGuardrail(events: DataFrame): DataFrame = {
    // ~6 metric streams × event-sized groups: the strictly-preceding
    // moment walk runs as a grouped Prefix.orderStats scan (rank +
    // exclusive exact sums; n_prior IS seq - 1), never one task per type
    graft.operators.Prefix.orderStats(
        events
          .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(round(value * 1000, 0) AS BIGINT)").as("vm"))
          .withColumn("vm2", expr("vm * vm")),
        Seq(col("us"), col("event_id")), group = Seq("event_type"),
        rn = Some("seq"),
        cumSumsExclusive = Seq(("vm", "s"), ("vm2", "ss")))
      .withColumn("n_prior", col("seq") - 1L)
      .withColumn("seq", col("seq").cast("int")) // keep the r8 output schema
      .select(col("event_type"), col("event_id"), col("seq"), col("n_prior"),
        expr("""n_prior >= 10 AND
           CAST(vm * n_prior - s AS DECIMAL(19,0)) * CAST(vm * n_prior - s AS DECIMAL(19,0))
           > 9 * (CAST(n_prior AS DECIMAL(19,0)) * CAST(ss AS DECIMAL(19,0))
                  - CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)))""").as("is_anomaly"))
  }

  def zscoreGuardrailStream(spark: SparkSession, events: Dataset[EvT]): Dataset[AnomalyOut] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new ZscoreProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class EvV(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    value: Double)
  final case class EwmaOut(user_id: Long, event_id: Long, ewma: Double)

  /** Running per-user EWMA (alpha = 1/2) in event order, one output row
    * per event — the incremental form of the q78 batch fold, and the
    * reason the streaming path exists at all: state is ONE double per
    * live user ([[EwmaProcessor]] on a v2 `ValueState`), where the batch
    * prefix-fold twin below carries each row's full prefix. The batch
    * twin folds the window-frame prefix list with the identical
    * left-to-right `0.5*acc + 0.5*x` IEEE sequence, so stream, batch and
    * the DuckDB oracle are bit-identical with no rounding crutch.
    */
  def runningEwma(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("pre", collect_list(col("value")).over(w))
      .select(col("user_id"), col("event_id"),
        expr("aggregate(slice(pre, 2, size(pre) - 1), pre[0], (acc, x) -> 0.5 * acc + 0.5 * x)")
          .as("ewma"))
  }

  def runningEwmaStream(spark: SparkSession, events: Dataset[EvV]): Dataset[EwmaOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class Ctx(user_id: Long, event_id: Long, context: String)

  /** Rolling last-3-event context per user, one row per event — the
    * "recent actions" feature a real-time model input pipeline attaches
    * to every event. Batch form = a bounded ROWS window frame (2
    * PRECEDING..CURRENT) collecting ids in event order (the st12 oracle
    * row); streaming form = [[RecentContextProcessor]] on a state API v2
    * `ListState` trimmed to the last K entries — with MapState (st11)
    * and the ValueState/timer session machines, that exercises every v2
    * state primitive. StreamingSpec proves stream == batch.
    */
  def recentContext(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(-2, 0)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("context", concat_ws(",", collect_list(col("event_id")).over(w)))
      .select("user_id", "event_id", "context")
  }

  def recentContextStream(spark: SparkSession, events: Dataset[Ev]): Dataset[Ctx] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RecentContextProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Microseconds since epoch incl. the sub-ms part (getTime truncates
    * to ms; getNanos carries the full nanos-of-second).
    */
  private[streaming] def usOf(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  final case class SessionState(sessionId: Long, startUs: Long, lastUs: Long, n: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long, duration_s: Double)
  /** [[SessionOut]] plus the event-time TIMER deadline that closes (or
    * closed) the session: `lastUs div 1000 + gap_ms + 1` — a pure
    * function of the session, so the batch twin derives it exactly.
    */
  final case class TimerSessionOut(user_id: Long, session_id: Long,
    n_events: Long, duration_s: Double, close_at_ms: Long)

  /** Streaming sessionization: custom state machine via
    * flatMapGroupsWithState. Emits a session when a 30-min gap closes it
    * (or on event-time timeout); state is one [[SessionState]] per live
    * user. StreamingSpec checks it against [[sessionizeBatch]].
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = 1800000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          // Per-batch arrivals sorted by event time; fold into sessions.
          val sorted = evs.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
          val init = state.getOption.getOrElse(Nil)
          var closed = List.empty[SessionState]
          var cur = init.headOption
          var nextId = init.headOption.map(_.sessionId).getOrElse(0L)
          sorted.foreach { e =>
            val us = usOf(e.ts)
            cur match {
              case Some(c) if us - c.lastUs <= gapUs =>
                cur = Some(c.copy(lastUs = math.max(c.lastUs, us), n = c.n + 1))
              case other =>
                other.foreach(c => closed ::= c)
                nextId += 1
                cur = Some(SessionState(nextId, us, us, 1))
            }
          }
          cur match {
            case Some(c) => state.update(List(c))
            case None    => if (init.isEmpty) state.remove()
          }
          closed.reverseIterator.map(c =>
            SessionOut(user, c.sessionId, c.n, (c.lastUs - c.startUs) / 1e6))
      }
  }


  /** The same sessionization on the NEW arbitrary-state API
    * (`transformWithState`, Spark 4's state API v2): the state machine
    * of [[sessionizeStream]] re-expressed as a [[SessionV2Processor]]
    * with typed `ValueState` from the StatefulProcessorHandle, which
    * buys per-state-variable TTL, timers, and the RocksDB state store
    * (required by the v2 API — changelog-checkpointed, spillable state,
    * the store a 100 TB/day deployment runs). StreamingSpec proves it
    * equals [[sessionizeBatch]] across micro-batches, like the v1 path.
    */
  def sessionizeStreamV2(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionV2Processor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Timer-closed sessionization — the PRODUCTION shape: a session is
    * emitted when the event-time WATERMARK passes its last event + gap,
    * via a registered event-time timer, not when the same user happens
    * to send a later event (the only closing signal the NoTimeout
    * variants have, which is why their specs inject flush sentinels —
    * a real stream has none). Each user holds one open-session
    * ValueState and one pending timer at `last event + gap + 1 ms`;
    * input rows re-arm the timer, stale timers no-op against the state
    * check. State is O(live users), dropped at emission.
    */
  def sessionizeStreamV2Timers(spark: SparkSession, events: Dataset[Ev],
      delay: String = "0 seconds"): Dataset[TimerSessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  def defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Tumbling window (batch form of the streaming agg; 1h windows are
    // UTC-aligned so date_trunc is the exact DuckDB equivalent).
    QueryDef("st01_hourly_window",
      (s, d) => hourlyCounts(Tables.events(s, d))
        .orderBy("hour_start", "event_type"),
      Some(s"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, count(*) AS n_events,
               ${Sql.oDsum("value")} AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY hour_start, event_type""")),

    // -------------------------------------------------------------------
    // Sliding window: each event lands in up to 4 overlapping 2h/30min
    // windows. Oracle enumerates the same offsets.
    QueryDef("st02_sliding_window",
      (s, d) => slidingCounts(Tables.events(s, d))
        .orderBy("win_start"),
      Some("""
        WITH slid AS (
          SELECT ts, date_trunc('hour', ts - INTERVAL 30 MINUTE * k.k)
                     + INTERVAL 30 MINUTE * (CAST(extract(minute FROM ts - INTERVAL 30 MINUTE * k.k) AS INT) // 30) AS win_start
          FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k)
        SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, count(*) AS n_events
        FROM slid
        GROUP BY 1
        ORDER BY win_start""")),

    // -------------------------------------------------------------------
    // Sessionization (batch form; the flatMapGroupsWithState streaming
    // variant is equivalence-tested in StreamingSpec).
    QueryDef("st03_sessionize",
      (s, d) => sessionizeBatch(Tables.events(s, d))
        .orderBy("user_id", "session_id"),
      Some("""
        WITH x AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        y AS (
          SELECT user_id, event_id, us,
                 CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM x),
        z AS (
          SELECT user_id, us,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
          FROM y)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               (max(us) - min(us)) / 1000000.0 AS duration_s
        FROM z
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // -------------------------------------------------------------------
    // Windowed top-k (batch form): the trending-now query — top 3 event
    // types per hour window. As a stream this is the standard
    // complete/foreachBatch ranking over the windowed counts (the
    // stateful agg is st01's; the rank is a per-window postprocess of
    // at most |event_type| rows per window, so the window function
    // never sees unbounded state).
    QueryDef("st04_window_topk",
      (s, d) => {
        graft.plans.GraftStrategies.install(s)
        val hc = hourlyCounts(Tables.events(s, d))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("hour_start").orderBy(col("n_events").desc, col("event_type"))
        hc.withColumn("rank", row_number().over(w).cast("int"))
          .filter(col("rank") <= 3)
          .select(col("hour_start"), col("rank"), col("event_type"), col("n_events"))
          .orderBy("hour_start", "rank")
      },
      Some("""
        WITH hc AS (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
                 event_type, count(*) AS n_events
          FROM events
          GROUP BY 1, 2)
        SELECT hour_start,
               CAST(row_number() OVER (PARTITION BY hour_start ORDER BY n_events DESC, event_type) AS INT) AS rank,
               event_type, n_events
        FROM hc
        QUALIFY rank <= 3
        ORDER BY hour_start, rank""")),

    // -------------------------------------------------------------------
    // Native session windows: Spark's built-in session_window() gap
    // aggregation (streamable with watermarks as-is) — the engine-level
    // counterpart of st03's hand-rolled lag+cumsum sessionization. Same
    // 30-minute gap; the oracle derives session bounds with the st03
    // window recipe and epoch-micro arithmetic.
    QueryDef("st05_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"))
        .orderBy("user_id", "session_start_us"),
      Some("""
        WITH x AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        y AS (
          SELECT user_id, us,
                 sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
          FROM x)
        SELECT user_id, min(us) AS session_start_us,
               max(us) + 1800000000 AS session_end_us,
               count(*) AS n_events
        FROM y
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us""")),

    // -------------------------------------------------------------------
    // Stream-stream interval join (batch form; StreamingSpec runs the
    // SAME errorContextJoin on a watermarked file stream and proves the
    // emitted pairs match). Pair-level q16: every (error, preceding
    // event within 5 min, same user) edge.
    QueryDef("st06_stream_stream_join",
      (s, d) => errorContextJoin(Tables.events(s, d))
        .orderBy("err_id", "ctx_event_id"),
      Some("""
        SELECT e1.event_id AS err_id, e2.event_id AS ctx_event_id
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts >= e1.ts - INTERVAL 5 MINUTE
         AND e2.ts < e1.ts
        WHERE e1.event_type = 'error'
        ORDER BY err_id, ctx_event_id""")),

    // -------------------------------------------------------------------
    // Stream-stream LEFT-OUTER interval join (batch form; StreamingSpec
    // runs the SAME errorContextJoinLeftOuter on a watermarked file
    // stream and proves the emitted rows — including the null-padded
    // no-context errors, which dominate the fixture — match).
    QueryDef("st15_stream_outer_join",
      (s, d) => errorContextJoinLeftOuter(Tables.events(s, d))
        .orderBy("err_id", "ctx_event_id"),
      Some("""
        SELECT e1.event_id AS err_id, e2.event_id AS ctx_event_id
        FROM events e1 LEFT JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts >= e1.ts - INTERVAL 5 MINUTE
         AND e2.ts < e1.ts
        WHERE e1.event_type = 'error'
        ORDER BY err_id, ctx_event_id NULLS FIRST""")),

    // -------------------------------------------------------------------
    // Streaming exact dedup (batch form): an at-least-once feed (events
    // replayed twice) deduplicated by event_id, counted per type —
    // dropDuplicatesWithinWatermark's semantics, which the oracle
    // expresses as count(DISTINCT event_id).
    QueryDef("st07_stream_dedup",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("event_type"))
        dedupCounts(ev.unionAll(ev)).orderBy("event_type")
      },
      Some("""
        WITH replayed AS (
          SELECT event_id, event_type FROM events
          UNION ALL
          SELECT event_id, event_type FROM events)
        SELECT event_type, count(DISTINCT event_id) AS n
        FROM replayed
        GROUP BY event_type
        ORDER BY event_type""")),

    // -------------------------------------------------------------------
    // Stream-static enrichment join (batch form; StreamingSpec runs the
    // SAME enrichedSegmentCounts on a file stream with the static
    // broadcast side and proves the aggregates match).
    QueryDef("st08_stream_static_join",
      (s, d) => enrichedSegmentCounts(Tables.events(s, d), Tables.customer(s, d))
        .orderBy("c_mktsegment", "event_type"),
      Some(s"""
        SELECT c_mktsegment, event_type,
               count(*) AS n_events, ${Sql.oDsum("value")} AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
        ORDER BY c_mktsegment, event_type""")),

    // -------------------------------------------------------------------
    // DYNAMIC-gap session window (batch form): each event extends its
    // session by an amount depending on the event itself — errors keep
    // the session alive 5 minutes, everything else 30 — the per-event-
    // type timeout shape real clickstream sessionization uses. Unlike
    // st05's fixed gap, the merge rule is interval-union: an event joins
    // the session if it starts before the RUNNING MAX of (ts + gap) of
    // everything before it (a later short-gap event does not shrink an
    // extension an earlier long-gap event already granted), and the
    // session end is that running max, not last-event + gap. The oracle
    // spells exactly that: prefix running max, boundary strictly after
    // max-end-so-far (an event AT the boundary merges — the same
    // convention st05's fixed-gap oracle encodes), cumulative-sum
    // session ids. Scale: same as any session window — one shuffle on
    // user_id, linear per-partition.
    QueryDef("st09_dynamic_gap_sessions",
      (s, d) => dynamicGapSessions(Tables.events(s, d))
        .orderBy("user_id", "session_start_us"),
      Some("""
        WITH x AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 epoch_us(ts) + CASE WHEN event_type = 'error'
                                     THEN 300000000 ELSE 1800000000 END AS ev_end
          FROM events),
        y AS (
          SELECT user_id, event_id, us, ev_end,
                 max(ev_end) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_end
          FROM x),
        z AS (
          SELECT user_id, us, ev_end,
                 sum(CASE WHEN prev_end IS NULL OR us > prev_end THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
          FROM y)
        SELECT user_id, min(us) AS session_start_us,
               max(ev_end) AS session_end_us, count(*) AS n_events
        FROM z
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us""")),

    // -------------------------------------------------------------------
    // Streaming admission vs a static historical index (batch form):
    // events whose id is already in "yesterday's" index (event_id % 3 = 0
    // simulates the prior ingest) are rejected; admitted traffic is
    // counted per type. The oracle's NOT IN is the anti-join contract
    // (event_id is non-null, so NOT IN == anti join here; q49 pins the
    // null-aware cases).
    QueryDef("st10_stream_admission",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("event_type"))
        val seen = ev.filter(pmod(col("event_id"), lit(3)) === 0).select("event_id")
        admitNew(ev, seen)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_admitted"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n_admitted
        FROM events
        WHERE event_id NOT IN
          (SELECT event_id FROM events WHERE event_id % 3 = 0)
        GROUP BY event_type
        ORDER BY event_type""")),

    // -------------------------------------------------------------------
    // Running per-user type stats (batch form of the MapState v2
    // processor): per event, how many of ITS type the user has produced
    // so far and how many distinct types in total — two window passes
    // sharing one (user_id | us, event_id) sort.
    QueryDef("st11_running_type_stats",
      (s, d) => runningTypeStats(Tables.events(s, d))
        .orderBy("user_id", "event_id"),
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        x AS (
          SELECT user_id, event_id, us,
                 CAST(row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY us, event_id) AS INT) AS type_count
          FROM e)
        SELECT user_id, event_id, type_count,
               CAST(sum(CASE WHEN type_count = 1 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS INT) AS distinct_types
        FROM x
        ORDER BY user_id, event_id""")),

    // -------------------------------------------------------------------
    // Rolling last-3-event context per user (batch form of the ListState
    // v2 processor): a bounded ROWS frame collecting ids in event order —
    // frame order is the window ORDER BY in both engines, so the joined
    // string is deterministic.
    QueryDef("st12_recent_context",
      (s, d) => recentContext(Tables.events(s, d))
        .orderBy("user_id", "event_id"),
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
        SELECT user_id, event_id,
               array_to_string(list(event_id)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), ',') AS context
        FROM e
        ORDER BY user_id, event_id""")),

    // -------------------------------------------------------------------
    // Timer-closed sessions (batch form of [[SessionTimerProcessor]],
    // the event-time-timer v2 processor): st03's gap sessions PLUS each
    // session's timer deadline — the watermark instant the processor's
    // registered timer fires at (`last_us div 1000 + gap_ms + 1`), a
    // pure function of the session, so batch derives it exactly.
    // StreamingSpec proves the streaming form emits these rows without
    // any flush sentinel: the WATERMARK closes sessions, the production
    // semantics the NoTimeout variants cannot express.
    QueryDef("st13_timer_sessions",
      (s, d) => timerSessionsBatch(Tables.events(s, d))
        .orderBy("user_id", "session_id"),
      Some("""
        WITH x AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        y AS (
          SELECT user_id, event_id, us,
                 CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM x),
        z AS (
          SELECT user_id, us,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
          FROM y)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               (max(us) - min(us)) / 1000000.0 AS duration_s,
               max(us) // 1000 + 1800001 AS close_at_ms
        FROM z
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // -------------------------------------------------------------------
    // Running EWMA per user (batch form of [[EwmaProcessor]]): one row
    // per event, folded left-to-right in event order — see [[runningEwma]]
    // for why the streaming ValueState form is the production shape
    // (O(1) state vs the batch twin's per-row prefix).
    QueryDef("st14_running_ewma",
      (s, d) => runningEwma(Tables.events(s, d)).orderBy("user_id", "event_id"),
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        p AS (
          SELECT user_id, event_id,
                 list(value) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS pre
          FROM e)
        SELECT user_id, event_id,
               list_reduce(pre, (acc, x) -> 0.5 * acc + 0.5 * x) AS ewma
        FROM p
        ORDER BY user_id, event_id""")),

    // -------------------------------------------------------------------
    // CHAINED stateful operators (Spark's multiple-stateful-operator
    // support): stage 1 closes 30-min session windows per user, stage 2
    // rolls the CLOSED sessions into hourly totals — two stateful aggs
    // in ONE query, stitched by window_time() (the event-time column of
    // a window struct, = w.end - 1us; that is what lets the second
    // watermarked agg consume the first's output — a sentence the
    // pre-3.5 workaround needed two queries and an intermediate sink
    // for). The EXACT SAME plan runs batch here and streaming in
    // StreamingSpec. Averages use the q62 integer round-half-up — no
    // float accumulates. Scale: both stages shuffle by their natural
    // keys (user, then hour); state is per-live-session + per-open-hour.
    QueryDef("st16_session_rollup",
      (s, d) => sessionHourlyRollup(Tables.events(s, d))
        .orderBy("h"),
      Some("""
        WITH x AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        y AS (
          SELECT user_id, event_id, us,
                 sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
          FROM x),
        sess AS (
          SELECT user_id, sid, count(*) AS n_ev,
                 max(us) - min(us) AS dur_us,
                 max(us) + 1800000000 AS end_us
          FROM y GROUP BY user_id, sid),
        roll AS (
          SELECT (end_us - 1) // 3600000000 AS h,
                 count(*) AS n_sessions,
                 CAST(sum(n_ev) AS BIGINT) AS n_events,
                 CAST(sum(dur_us) AS BIGINT) AS sum_dur_us
          FROM sess GROUP BY h)
        SELECT h, n_sessions, n_events, sum_dur_us,
               CAST((2 * sum_dur_us + n_sessions) // (2 * n_sessions) AS BIGINT) AS avg_dur_us,
               CAST(CAST((2 * sum_dur_us + n_sessions) // (2 * n_sessions) AS BIGINT) AS DOUBLE)
                 / 1000000.0 AS avg_dur_s
        FROM roll
        ORDER BY h""")),

    // -------------------------------------------------------------------
    // Streaming CUSUM drift monitor — q94's online form. q94 references
    // the per-user FULL-history mean (not streamable); the monitoring
    // deployment uses a FIXED reference target + slack (the SPC chart's
    // mu_0/k), which makes the recursion incremental: state is ONE
    // BIGINT per live user. Batch twin = per-row prefix fold (the
    // st14/q78 window-frame shape) with the IDENTICAL exact-integer
    // step, so stream (CusumProcessor on a v2 ValueState), batch, and
    // the DuckDB list_reduce oracle agree row-for-row with no rounding.
    // Emits one row per event: the post-event statistic + alarm flag.
    QueryDef("st17_stream_cusum",
      (s, d) => streamingCusum(Tables.events(s, d)).orderBy("user_id", "event_id"),
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6
          FROM events),
        pre AS (
          SELECT user_id, event_id, v6,
                 list(v6) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
          FROM ev),
        walked AS (
          SELECT user_id, event_id, v6,
                 list_reduce(list_prepend(CAST(0 AS BIGINT), coalesce(prev, [])),
                   (acc, x) -> CASE WHEN greatest(CAST(0 AS BIGINT), acc + x - 70000000) > 200000000
                                    THEN CAST(0 AS BIGINT)
                                    ELSE greatest(CAST(0 AS BIGINT), acc + x - 70000000) END) AS s_prev
          FROM pre)
        SELECT user_id, event_id,
               CASE WHEN greatest(CAST(0 AS BIGINT), s_prev + v6 - 70000000) > 200000000
                    THEN CAST(0 AS BIGINT)
                    ELSE greatest(CAST(0 AS BIGINT), s_prev + v6 - 70000000) END AS s_after,
               greatest(CAST(0 AS BIGINT), s_prev + v6 - 70000000) > 200000000 AS alarmed
        FROM walked
        ORDER BY user_id, event_id""")),

    // -------------------------------------------------------------------
    // CEP sequence detection: per user, view -> click -> purchase in
    // event order with the whole pattern inside a 24h window — the
    // funnel-as-a-pattern-match operator (Flink CEP / MATCH_RECOGNIZE
    // territory). Semantics are "greedy latest predecessors, no
    // consumption": a purchase matches the LATEST preceding click that
    // itself had a preceding view, carrying that click's view — which
    // is exactly two chained strictly-preceding IGNORE-NULLS windows
    // (the q91 shape, composed), and on a stream is O(1) ValueState per
    // user (last view + last view-carrying click — [[SeqDetectProcessor]];
    // StreamingSpec proves stream == batch row-for-row with matches
    // spanning micro-batch boundaries). A consume-on-match variant
    // would need the full prefix-fold (st17's shape) instead.
    QueryDef("st18_sequence_detect",
      (s, d) => sequenceDetect(Tables.events(s, d)).orderBy("user_id", "purchase_id"),
      Some(s"""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        p1 AS (
          SELECT *,
                 last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
                   OVER w AS v_us,
                 last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
                   OVER w AS v_id
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        p2 AS (
          SELECT *,
                 last_value(CASE WHEN event_type = 'click' AND v_us IS NOT NULL THEN v_us END IGNORE NULLS)
                   OVER w AS cv_us,
                 last_value(CASE WHEN event_type = 'click' AND v_us IS NOT NULL THEN v_id END IGNORE NULLS)
                   OVER w AS cv_id,
                 last_value(CASE WHEN event_type = 'click' AND v_us IS NOT NULL THEN us END IGNORE NULLS)
                   OVER w AS c_us,
                 last_value(CASE WHEN event_type = 'click' AND v_us IS NOT NULL THEN event_id END IGNORE NULLS)
                   OVER w AS c_id
          FROM p1
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT user_id, cv_id AS view_id, c_id AS click_id,
               event_id AS purchase_id, us - cv_us AS span_us
        FROM p2
        WHERE event_type = 'purchase' AND c_us IS NOT NULL AND us - cv_us <= $SEQ_WIN
        ORDER BY user_id, purchase_id""")),

    // -------------------------------------------------------------------
    // Streaming drawdown monitor (q100's online form): the running
    // equity / peak / drawdown row per flow event. All three prefix
    // quantities are incrementally maintainable, so the streaming state
    // is ONE (equity, peak) pair per user ([[DrawdownProcessor]]);
    // StreamingSpec proves stream == batch row-for-row with peaks
    // carried across micro-batch boundaries.
    QueryDef("st19_stream_drawdown",
      (s, d) => drawdownRows(Tables.events(s, d)).orderBy("user_id", "event_id"),
      Some("""
        WITH flows AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                      ELSE -CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END AS flow
          FROM events WHERE event_type IN ('purchase', 'error')),
        curve AS (
          SELECT user_id, event_id, us,
                 CAST(sum(flow) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS eq
          FROM flows),
        peaked AS (
          SELECT user_id, event_id, eq,
                 greatest(CAST(0 AS BIGINT), CAST(max(eq) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS peak
          FROM curve)
        SELECT user_id, event_id, eq, peak, peak - eq AS drawdown
        FROM peaked
        ORDER BY user_id, event_id""")),

    // -------------------------------------------------------------------
    // Streaming one-step-ahead forecaster (q125's online form): every
    // arriving event is first scored against the PRIOR Holt state's
    // forecast l+b, then folded into the state (alpha = gamma = 1/2,
    // q97/q125's exact double contract). The streaming state is ONE
    // (l, b, count) triple per user ([[ForecastProcessor]]);
    // StreamingSpec proves stream == batch bit-for-bit on the doubles,
    // with state carried across micro-batch boundaries. The batch twin
    // replays the walk in a single sequential fold that APPENDS each
    // step's (forecast, err) — same recursion, declarative plan.
    QueryDef("st20_stream_forecast",
      (s, d) => forecastRows(Tables.events(s, d)).orderBy("user_id", "pos"),
      Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        seq AS (
          SELECT user_id, event_id, value,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS INT) AS pos
          FROM ev),
        walk(user_id, pos, l, b, event_id, forecast, err) AS (
          SELECT user_id, 1, value, CAST(0 AS DOUBLE),
                 CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
          FROM seq WHERE pos = 1
          UNION ALL
          SELECT w.user_id, e.pos,
                 0.5 * e.value + 0.5 * (w.l + w.b),
                 0.5 * ((0.5 * e.value + 0.5 * (w.l + w.b)) - w.l) + 0.5 * w.b,
                 e.event_id, w.l + w.b, e.value - (w.l + w.b)
          FROM walk w JOIN seq e ON e.user_id = w.user_id AND e.pos = w.pos + 1)
        SELECT user_id, event_id, pos, forecast, err
        FROM walk WHERE pos >= 2
        ORDER BY user_id, pos""")),

    // -------------------------------------------------------------------
    // Streaming decayed trending counter: per item (props.k) the classic
    // integer half-life-per-day counter — on each event the running
    // score is right-shifted by the day gap since the item's last event
    // (exact integer truncation, the Morris-style decay every trending
    // backend ships) then incremented. The truncation happens per STEP,
    // so the value is defined by the sequential walk itself; batch
    // replays the identical fold ([[decayedRows]]), the stream carries
    // ONE (last_day, score) pair per item ([[DecayProcessor]]), and
    // StreamingSpec proves stream == batch on every intermediate row.
    // Day gaps > 62 collapse the score to 0 instead of overflowing the
    // shift (robust to fixture regeneration).
    QueryDef("st21_decayed_counter",
      (s, d) => decayedRows(Tables.events(s, d)).orderBy("item_k", "pos"),
      Some("""
        WITH RECURSIVE ev AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_k,
                 event_id, epoch_us(ts) AS us,
                 datediff('day', TIMESTAMP '1970-01-01 00:00:00', ts) AS day
          FROM events),
        seq AS (
          SELECT item_k, event_id, day,
                 CAST(row_number() OVER (PARTITION BY item_k ORDER BY us, event_id) AS INT) AS pos
          FROM ev),
        walk(item_k, pos, event_id, day, score) AS (
          SELECT item_k, 1, event_id, day, CAST(1 AS BIGINT)
          FROM seq WHERE pos = 1
          UNION ALL
          SELECT w.item_k, e.pos, e.event_id, e.day,
                 CASE WHEN e.day - w.day > 62 THEN CAST(0 AS BIGINT)
                      ELSE w.score // (CAST(1 AS BIGINT) << CAST(e.day - w.day AS INT)) END + 1
          FROM walk w JOIN seq e ON e.item_k = w.item_k AND e.pos = w.pos + 1)
        SELECT item_k, pos, event_id, day, score
        FROM walk
        ORDER BY item_k, pos""")),

    // -------------------------------------------------------------------
    // Streaming 3-sigma guardrail: per event_type, each arriving value
    // is flagged against the running mean/variance of the PRIOR values
    // only (never its own) — the metric-anomaly monitor every
    // observability stack runs in front of a pipeline. Values are
    // quantized to milli units so the running moments (n, Σv, Σv²) are
    // EXACT integers, and the 3σ test is the cross-multiplied integer
    // inequality (v·n − Σv)² > 9·(n·Σv² − (Σv)²) — no division, no
    // sqrt, no float state, so stream, batch-window twin and the DuckDB
    // oracle agree bit-for-bit. Warm-up: flags only after 10 prior
    // observations. Stream state is ONE (n, s, ss) triple per type
    // ([[ZscoreProcessor]]); the batch twin carries the same moments as
    // strictly-preceding window sums.
    QueryDef("st22_stream_zscore_guardrail",
      (s, d) => zscoreGuardrail(Tables.events(s, d)).orderBy("event_type", "seq"),
      Some("""
        WITH ev AS (
          SELECT event_type, event_id, epoch_us(ts) AS us,
                 CAST(round(value * 1000, 0) AS BIGINT) AS vm
          FROM events),
        w AS (
          SELECT event_type, event_id, vm,
                 CAST(row_number() OVER tw AS INT) AS seq,
                 CAST(count(*) OVER tp AS BIGINT) AS n_prior,
                 CAST(coalesce(sum(vm) OVER tp, 0) AS BIGINT) AS s,
                 CAST(coalesce(sum(vm * vm) OVER tp, 0) AS BIGINT) AS ss
          FROM ev
          WINDOW tw AS (PARTITION BY event_type ORDER BY us, event_id),
                 tp AS (PARTITION BY event_type ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT event_type, event_id, seq, n_prior,
               n_prior >= 10 AND
               CAST(vm * n_prior - s AS HUGEINT) * CAST(vm * n_prior - s AS HUGEINT)
               > 9 * (CAST(n_prior AS HUGEINT) * CAST(ss AS HUGEINT)
                      - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS is_anomaly
        FROM w
        ORDER BY event_type, seq""")),

    // -------------------------------------------------------------------
    // Absence detection (the CEP "negative pattern"): a view that is NOT
    // followed by a purchase from the same user within 6 hours raises an
    // alert — the abandoned-funnel monitor st18's positive-sequence
    // detector cannot express, and THE canonical use of event-time
    // timers (nothing arrives to trigger the alert; only the watermark
    // can). Batch twin: first qualifying purchase per view via one
    // bounded user-key join + min(struct); status 'converted' /
    // 'alert' / 'pending' — a view stays pending while its deadline
    // (`view_us div 1000 + 6h_ms + 1`, the st13 timer convention) is
    // beyond the end-of-stream watermark. The streaming form
    // ([[AbsenceProcessor]]) keeps a pending-view ListState per user,
    // converts on purchase arrival, and alerts from expired timers;
    // StreamingSpec proves stream output == this twin minus 'pending'.
    QueryDef("st23_absence_alert",
      (s, d) => absenceAlerts(Tables.events(s, d))
        .orderBy("user_id", "view_event_id"),
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        wm AS (SELECT max(us) // 1000 AS wm_ms FROM ev),
        v AS (SELECT user_id, event_id AS view_event_id, us AS vus
              FROM ev WHERE event_type = 'view'),
        p AS (SELECT user_id, event_id AS p_id, us AS pus
              FROM ev WHERE event_type = 'purchase'),
        conv AS (
          SELECT user_id, view_event_id, p_id AS converted_by FROM (
            SELECT v.user_id, v.view_event_id, p.p_id,
                   row_number() OVER (PARTITION BY v.user_id, v.view_event_id
                                      ORDER BY p.pus, p.p_id) AS rn
            FROM v JOIN p ON p.user_id = v.user_id
                         AND p.pus > v.vus AND p.pus <= v.vus + 21600000000)
          WHERE rn = 1)
        SELECT v.user_id, v.view_event_id,
               v.vus // 1000 + 21600001 AS deadline_ms,
               CASE WHEN c.converted_by IS NOT NULL THEN 'converted'
                    WHEN v.vus // 1000 + 21600001 <= wm_ms THEN 'alert'
                    ELSE 'pending' END AS status,
               c.converted_by
        FROM v
        LEFT JOIN conv c ON c.user_id = v.user_id
                        AND c.view_event_id = v.view_event_id
        CROSS JOIN wm
        ORDER BY v.user_id, v.view_event_id""")),

    // -------------------------------------------------------------------
    // KMV distinct-user sketch per event_type — the batch twin of the
    // sketch-in-state streaming pattern ([[KmvProcessor]]): the k=64
    // smallest 52-bit user hashes, the exact distinct count, and the
    // KMV estimate (k−1)·2^52/h_k (q84's math on a per-type state a
    // stream can actually carry: 64 longs per key instead of a
    // distinct-set). StreamingSpec proves the stream's final per-type
    // estimate equals this twin exactly — same hashes, same kth, same
    // rounding. Scale: the per-type sketch is one partial-aggregable
    // top-k of hashes; n_exact is the audit column only batch can
    // afford.
    QueryDef("st24_stream_kmv",
      (s, d) => kmvByType(Tables.events(s, d)).orderBy("event_type"),
      Some(s"""
        WITH base AS (SELECT DISTINCT event_type, user_id FROM events),
        h AS (SELECT DISTINCT event_type,
                     ${graft.operators.Ns.oHash52("CAST(user_id AS VARCHAR)")} AS h
              FROM base),
        r AS (SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
              FROM h),
        sk AS (SELECT event_type, count(*) AS n_sketch, max(h) AS kth
               FROM r WHERE rn <= 64 GROUP BY event_type),
        ex AS (SELECT event_type, count(*) AS n_exact FROM base GROUP BY event_type)
        SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_sketch AS BIGINT) AS n_sketch, CAST(kth AS BIGINT) AS kth,
               round(CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
                          ELSE CAST(${63L * 4503599627370496L} AS DOUBLE) / CAST(kth AS DOUBLE)
                     END, 4) AS est_distinct
        FROM ex JOIN sk USING (event_type)
        ORDER BY event_type"""))
  )

  /** Pattern window for [[sequenceDetect]]: the view->click->purchase
    * chain must span at most 24 hours (the q91 attribution lookback).
    */
  private[streaming] val SEQ_WIN = 86400000000L

  /** Batch twin of the CEP sequence detector: two chained
    * strictly-preceding IGNORE-NULLS window passes — pass 1 carries the
    * latest view, pass 2 the latest click that had one (all four fields
    * gated on the SAME null condition, so they come from one row).
    */
  def sequenceDetect(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isCand = col("event_type") === "click" && col("v_us").isNotNull
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("v_us",
        last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
      .withColumn("v_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("cv_us", last(when(isCand, col("v_us")), ignoreNulls = true).over(w))
      .withColumn("cv_id", last(when(isCand, col("v_id")), ignoreNulls = true).over(w))
      .withColumn("c_us", last(when(isCand, col("us")), ignoreNulls = true).over(w))
      .withColumn("c_id", last(when(isCand, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("c_us").isNotNull &&
        col("us") - col("cv_us") <= SEQ_WIN)
      .select(col("user_id"), col("cv_id").as("view_id"), col("c_id").as("click_id"),
        col("event_id").as("purchase_id"), (col("us") - col("cv_us")).as("span_us"))
  }

  final case class SeqMatch(user_id: Long, view_id: Long, click_id: Long,
    purchase_id: Long, span_us: Long)
  final case class SeqState(vUs: Long, vId: Long, cvUs: Long, cvId: Long,
    cUs: Long, cId: Long, hasV: Boolean, hasC: Boolean)

  def sequenceDetectStream(spark: SparkSession, events: Dataset[Ev2]): Dataset[SeqMatch] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SeqDetectProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin of the streaming drawdown monitor: q100's running
    * equity/peak/drawdown columns per flow event (purchases credit,
    * errors debit), exact integer cents through two window passes. The
    * streaming form ([[DrawdownProcessor]]) carries (equity, peak,
    * max-drawdown) as ONE ValueState per user — the prefix quantities
    * are all incrementally maintainable, unlike a full-history mean.
    */
  def drawdownRows(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        expr("""CASE WHEN event_type = 'purchase'
                     THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                     ELSE -CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END""").as("flow"))
      .withColumn("eq", sum(col("flow")).over(w))
      .withColumn("peak", greatest(lit(0L), max(col("eq")).over(w)))
      .withColumn("drawdown", col("peak") - col("eq"))
      .select(col("user_id"), col("event_id"), col("eq"), col("peak"), col("drawdown"))
  }

  final case class DdOut(user_id: Long, event_id: Long, eq: Long, peak: Long, drawdown: Long)
  final case class DdState(eq: Long, peak: Long)

  def drawdownStream(spark: SparkSession, events: Dataset[EvT]): Dataset[DdOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new DrawdownProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class EvT(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  /** The 6-hour conversion window of st23 (microseconds). */
  private[streaming] val ABSENCE_WIN_US = 21600000000L
  final case class PendingView(event_id: Long, us: Long, deadlineMs: Long)
  final case class AbsenceOut(user_id: Long, view_event_id: Long,
    deadline_ms: Long, status: String, converted_by: Option[Long])

  /** Batch twin of the st23 absence detector — see the QueryDef note.
    * The purchase lookup is a user-key equi-join with a bounded range
    * predicate (per-user event lists are the q88/q94 per-key contract),
    * then `min(struct(pus, p_id))` picks the first qualifying purchase
    * without a per-view sort.
    */
  def absenceAlerts(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
    val wm = ev.agg(expr("max(us) div 1000").as("wm_ms"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event_id"), col("us").as("vus"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("p_id"), col("us").as("pus"))
    val conv = views.join(purch,
        col("pu") === col("user_id") && col("pus") > col("vus")
          && col("pus") <= col("vus") + ABSENCE_WIN_US)
      .groupBy("user_id", "view_event_id")
      .agg(min(struct(col("pus"), col("p_id"))).as("first_p"))
      .select(col("user_id"), col("view_event_id"),
        col("first_p").getField("p_id").as("converted_by"))
    views.join(conv, Seq("user_id", "view_event_id"), "left")
      .crossJoin(broadcast(wm))
      .select(col("user_id"), col("view_event_id"),
        expr("vus div 1000 + 21600001").as("deadline_ms"),
        when(col("converted_by").isNotNull, "converted")
          .when(expr("vus div 1000 + 21600001") <= col("wm_ms"), "alert")
          .otherwise("pending").as("status"),
        col("converted_by"))
  }

  /** Streaming absence detection: event-time timers raise the alerts —
    * see [[AbsenceProcessor]].
    */
  def absenceAlertStream(spark: SparkSession, events: Dataset[EvT],
      delay: String = "0 seconds"): Dataset[AbsenceOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new AbsenceProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  final case class KmvOut(event_type: String, n_sketch: Long, kth: Long,
    est_distinct: Double)

  /** Batch twin of the st24 per-type KMV sketch (k = 64, 52-bit md5
    * hashes, estimate (k−1)·2^52/h_k — q84's recipe as carryable
    * state).
    */
  def kmvByType(events: DataFrame): DataFrame = {
    val k = 64
    val kthNum = 63L * 4503599627370496L
    val base = events.select(col("event_type"), col("user_id")).distinct()
    val hashed = base
      .withColumn("h", expr(graft.operators.Ns.hash52("CAST(user_id AS STRING)")))
      .select("event_type", "h").distinct()
    val sk = hashed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("event_type").agg(count(lit(1)).as("n_sketch"), max("h").as("kth"))
    base.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      .join(sk, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_sketch"), col("kth"),
        round(when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit(kthNum).cast("double") / col("kth").cast("double")), 4)
          .as("est_distinct"))
  }

  def kmvStream(spark: SparkSession, events: Dataset[EvT]): Dataset[KmvOut] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new KmvProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin of the streaming one-step forecaster: one sequential
    * fold per user over the time-ordered values, appending each step's
    * (event_id, pos, forecast = prior l+b, err) before the Holt state
    * update — the SAME double recursion as q125 and
    * [[ForecastProcessor]] (alpha = gamma = 1/2, identical op order).
    * Scale: one shuffle to the user key; per-user series are
    * fixture-bounded (the q88/q94 per-key contract).
    */
  def forecastRows(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        expr("sort_array(collect_list(struct(us, event_id, value)))").as("evs"))
      .filter(col("n_events") >= 2)
      .withColumn("fin", expr(
        """aggregate(slice(evs, 2, size(evs) - 1),
            named_struct('l', element_at(evs, 1).value, 'b', CAST(0 AS DOUBLE),
              'outs', CAST(array() AS
                ARRAY<STRUCT<event_id: BIGINT, pos: INT, forecast: DOUBLE, err: DOUBLE>>)),
            (acc, x) -> named_struct(
              'l', 0.5 * x.value + 0.5 * (acc.l + acc.b),
              'b', 0.5 * ((0.5 * x.value + 0.5 * (acc.l + acc.b)) - acc.l) + 0.5 * acc.b,
              'outs', array_append(acc.outs, named_struct(
                'event_id', x.event_id, 'pos', CAST(size(acc.outs) + 2 AS INT),
                'forecast', acc.l + acc.b, 'err', x.value - (acc.l + acc.b)))))"""))
      .select(col("user_id"), explode(col("fin.outs")).as("o"))
      .select(col("user_id"), col("o.event_id").as("event_id"), col("o.pos").as("pos"),
        col("o.forecast").as("forecast"), col("o.err").as("err"))

  final case class FcOut(user_id: Long, event_id: Long, pos: Int,
    forecast: Double, err: Double)
  final case class FcState(l: Double, b: Double, cnt: Int)

  /** Batch twin of the streaming decayed trending counter: one
    * sequential fold per item over the time-ordered events — score is
    * right-shifted by the day gap (per-step integer truncation, gaps
    * > 62 collapse to 0), then incremented. Same walk as
    * [[DecayProcessor]]. Scale: one shuffle to the item key; the fold
    * is linear in the per-item series.
    */
  /** Batch twin of [[DecayProcessor]] as a TYPED per-key kernel: the
    * score recurrence is inherently sequential per item (each step
    * right-shifts the PREVIOUS score by the day gap), and the HOF
    * spelling this replaced carried the emitted rows in an array-append
    * accumulator — O(n^2) struct copies per key, measured 4.1 s at
    * sf0.1 vs ~0.5 s for this O(n) walk. Partition-invariant: keys are
    * independent, the within-key order (us, event_id) is total.
    */
  def decayedRows(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("item_k"),
        col("event_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(datediff(ts, TIMESTAMP'1970-01-01 00:00:00') AS INT)").as("day"))
      .as[(Long, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        var d = 0
        var sc = 0L
        evs.iterator.zipWithIndex.map { case ((_, eid, _, day), i) =>
          val gap = day - d
          sc = if (i == 0) 1L else (if (gap > 62) 0L else sc >> gap) + 1L
          d = day
          DcOut(k, i + 1, eid, day, sc)
        }
      }
      .toDF()
  }

  final case class DcOut(item_k: Long, pos: Int, event_id: Long, day: Int, score: Long)
  final case class DcState(lastDay: Int, score: Long, cnt: Int)
  final case class EvK(event_id: Long, ts: java.sql.Timestamp, item_k: Long)

  def decayedStream(spark: SparkSession, events: Dataset[EvK]): Dataset[DcOut] = {
    import spark.implicits._
    events
      .groupByKey(_.item_k)
      .transformWithState(new DecayProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  def forecastStream(spark: SparkSession, events: Dataset[EvT]): Dataset[FcOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ForecastProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** One CUSUM step on the exact micro-unit statistic: clip at zero,
    * alarm + reset above the threshold. Target 50 units + slack 20
    * units = 70_000_000 micros; threshold 200 units. Shared by the
    * batch prefix fold, the streaming processor, and (textually) the
    * DuckDB oracle.
    */
  private[streaming] val CUSUM_DRIFT = 70000000L
  private[streaming] val CUSUM_H = 200000000L
  private[streaming] def cusumClip(s: Long, x: Long): Long =
    math.max(0L, s + x - CUSUM_DRIFT)

  /** Batch twin of the streaming CUSUM: per-row prefix fold with the
    * identical integer step (st14's window-frame shape).
    */
  def streamingCusum(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val step = (acc: String, x: String) =>
      s"CASE WHEN greatest(CAST(0 AS BIGINT), $acc + $x - ${CUSUM_DRIFT}L) > ${CUSUM_H}L " +
        s"THEN CAST(0 AS BIGINT) ELSE greatest(CAST(0 AS BIGINT), $acc + $x - ${CUSUM_DRIFT}L) END"
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
      .withColumn("prev", collect_list(col("v6")).over(w))
      .withColumn("s_prev", expr(
        s"aggregate(prev, CAST(0 AS BIGINT), (acc, x) -> ${step("acc", "x")})"))
      .select(col("user_id"), col("event_id"),
        expr(step("s_prev", "v6")).as("s_after"),
        expr(s"greatest(CAST(0 AS BIGINT), s_prev + v6 - ${CUSUM_DRIFT}L) > ${CUSUM_H}L")
          .as("alarmed"))
  }

  final case class CusumOut(user_id: Long, event_id: Long, s_after: Long, alarmed: Boolean)

  def cusumStream(spark: SparkSession, events: Dataset[EvV]): Dataset[CusumOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new CusumProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** The chained session->hourly rollup plan — ONE expression tree used
    * verbatim in batch (st16's QueryDef) and on a watermarked stream
    * (StreamingSpec): session_window per user, then an hour bucket over
    * window_time(w) (= w.end - 1us, so a session closing exactly on an
    * hour boundary lands in the preceding hour — both engines spell
    * that (end_us - 1) div 3600000000).
    */
  def sessionHourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_ev"),
        (unix_micros(col("w.end")) - lit(1800000000L) - unix_micros(col("w.start")))
          .as("dur_us"))
      .groupBy(window(window_time(col("w")), "1 hour").as("hw"))
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_ev").as("n_events"),
        sum("dur_us").as("sum_dur_us"))
      .select(expr("unix_micros(hw.start) div 3600000000").as("h"),
        col("n_sessions"), col("n_events"), col("sum_dur_us"))
      .withColumn("avg_dur_us",
        expr("CAST((2 * sum_dur_us + n_sessions) div (2 * n_sessions) AS BIGINT)"))
      .withColumn("avg_dur_s", col("avg_dur_us").cast("double") / lit(1000000.0))

  /** Batch twin of the timer-closed sessionization: [[sessionizeBatch]]
    * plus the deterministic timer deadline column.
    */
  def timerSessionsBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(run).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_s"),
        (expr("max(us) div 1000") + lit(1800001L)).as("close_at_ms"))
  }
}

/** 30-min-gap sessionization as a state API v2 [[StatefulProcessor]]:
  * one typed `ValueState[SessionState]` per live user (the current open
  * session), sessions emitted when a gap closes them. Identical state
  * machine to the flatMapGroupsWithState variant — the point of keeping
  * both is a like-for-like comparison of the two state APIs on the same
  * semantics, proven equal to the batch window plan in StreamingSpec.
  */
class SessionV2Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.Ev, Streams.SessionOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var cur: ValueState[Streams.SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[Streams.SessionState]("session",
      org.apache.spark.sql.Encoders.product[Streams.SessionState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.Ev],
      tv: TimerValues): Iterator[Streams.SessionOut] = {
    val gapUs = 1800000000L
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var closed = List.empty[Streams.SessionState]
    var c = if (cur.exists()) Option(cur.get()) else None
    var nextId = c.map(_.sessionId).getOrElse(0L)
    sorted.foreach { e =>
      val us = Streams.usOf(e.ts)
      c match {
        case Some(s0) if us - s0.lastUs <= gapUs =>
          c = Some(s0.copy(lastUs = math.max(s0.lastUs, us), n = s0.n + 1))
        case other =>
          other.foreach(s0 => closed ::= s0)
          nextId += 1
          c = Some(Streams.SessionState(nextId, us, us, 1))
      }
    }
    c.foreach(cur.update)
    closed.reverseIterator.map(s0 =>
      Streams.SessionOut(user, s0.sessionId, s0.n, (s0.lastUs - s0.startUs) / 1e6))
  }
}

/** Running per-type counts on the state API v2 `MapState`: one map
  * entry per (user, event_type) — the state primitive for keyed
  * sub-aggregates, complementing the `ValueState` session machines. The
  * distinct-type count is the map's key iterator length (bounded by the
  * type vocabulary). Proven equal to [[Streams.runningTypeStats]]'s
  * window-plan batch form in StreamingSpec.
  */
class TypeStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.Ev2, Streams.TypeStat] {
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig}

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("type_counts",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.Ev2],
      tv: TimerValues): Iterator[Streams.TypeStat] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var distinct = counts.keys().size
    val out = sorted.map { e =>
      val prev = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
      if (prev == 0L) distinct += 1
      counts.updateValue(e.event_type, prev + 1)
      Streams.TypeStat(user, e.event_id, (prev + 1).toInt, distinct)
    }
    out.iterator
  }
}

/** Rolling last-K context on the state API v2 `ListState`: the buffer
  * primitive (append + trim), completing the v2 state-surface coverage
  * next to `ValueState` (sessions), `MapState` (type counts) and
  * event-time timers. Proven equal to [[Streams.recentContext]]'s
  * bounded-window-frame batch form in StreamingSpec.
  */
class RecentContextProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.Ev, Streams.Ctx] {
  import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig}

  private val K = 3
  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[Long]("recent_ids",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.Ev],
      tv: TimerValues): Iterator[Streams.Ctx] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var buf = recent.get().toSeq
    val out = sorted.map { e =>
      buf = (buf :+ e.event_id).takeRight(K)
      Streams.Ctx(user, e.event_id, buf.mkString(","))
    }
    recent.put(buf.toArray)
    out.iterator
  }
}

/** [[SessionV2Processor]] plus event-time timers: sessions also close
  * when the watermark passes `last event + gap`, so the stream emits
  * every finished session without needing a later same-user event.
  */
class SessionTimerProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.Ev, Streams.TimerSessionOut] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  private val gapUs = 1800000000L
  private val gapMs = gapUs / 1000L

  @transient private var cur: ValueState[Streams.SessionState] = _

  private def expiryOf(s: Streams.SessionState): Long = s.lastUs / 1000L + gapMs + 1

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[Streams.SessionState]("session",
      org.apache.spark.sql.Encoders.product[Streams.SessionState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.Ev],
      tv: TimerValues): Iterator[Streams.TimerSessionOut] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var closed = List.empty[Streams.SessionState]
    var c = if (cur.exists()) Option(cur.get()) else None
    // the open session's pending timer is re-armed below (the state
    // check in handleExpiredTimer makes stale timers no-ops anyway,
    // but deleting keeps the timer store at one entry per live user)
    c.foreach(s0 => getHandle.deleteTimer(expiryOf(s0)))
    var nextId = c.map(_.sessionId).getOrElse(0L)
    sorted.foreach { e =>
      val us = Streams.usOf(e.ts)
      c match {
        case Some(s0) if us - s0.lastUs <= gapUs =>
          c = Some(s0.copy(lastUs = math.max(s0.lastUs, us), n = s0.n + 1))
        case other =>
          other.foreach(s0 => closed ::= s0)
          nextId += 1
          c = Some(Streams.SessionState(nextId, us, us, 1))
      }
    }
    c.foreach { s0 =>
      cur.update(s0)
      getHandle.registerTimer(expiryOf(s0))
    }
    closed.reverseIterator.map(s0 =>
      Streams.TimerSessionOut(user, s0.sessionId, s0.n,
        (s0.lastUs - s0.startUs) / 1e6, expiryOf(s0)))
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[Streams.TimerSessionOut] = {
    if (cur.exists()) {
      val s0 = cur.get()
      if (info.getExpiryTimeInMs >= expiryOf(s0)) {
        cur.clear()
        Iterator.single(
          Streams.TimerSessionOut(user, s0.sessionId, s0.n,
            (s0.lastUs - s0.startUs) / 1e6, expiryOf(s0)))
      } else Iterator.empty
    } else Iterator.empty
  }
}

/** Running per-user EWMA on a v2 `ValueState[Double]`: the O(1)-state
  * incremental form of the q78/st14 fold. Each batch folds its rows in
  * (event-time, event_id) order on top of the carried accumulator —
  * the same IEEE operation sequence as the batch prefix fold, so
  * StreamingSpec's stream == batch comparison is exact equality.
  */
class EwmaProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.EvV, Streams.EwmaOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var acc: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState[Double]("ewma",
      org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.EvV],
      tv: TimerValues): Iterator[Streams.EwmaOut] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var cur = if (acc.exists()) Some(acc.get()) else None
    val out = sorted.map { e =>
      val next = cur match {
        case Some(v) => 0.5 * v + 0.5 * e.value
        case None => e.value
      }
      cur = Some(next)
      Streams.EwmaOut(user, e.event_id, next)
    }
    cur.foreach(acc.update)
    out.iterator
  }
}

/** Streaming CUSUM on a v2 `ValueState[Long]`: the O(1)-state online
  * form of st17's batch prefix fold — each batch walks its rows in
  * (event-time, event_id) order on top of the carried statistic with
  * the IDENTICAL exact-integer step, so stream == batch exactly.
  */
class CusumProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.EvV, Streams.CusumOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var acc: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState[Long]("cusum",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.EvV],
      tv: TimerValues): Iterator[Streams.CusumOut] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var s = if (acc.exists()) acc.get() else 0L
    val out = sorted.map { e =>
      val v6 = BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
      val clipped = Streams.cusumClip(s, v6)
      val alarmed = clipped > Streams.CUSUM_H
      s = if (alarmed) 0L else clipped
      Streams.CusumOut(user, e.event_id, s, alarmed)
    }
    acc.update(s)
    out.iterator
  }
}

/** CEP sequence detection on v2 state: the O(1)-per-user online form of
  * [[Streams.sequenceDetect]]'s chained-window batch plan. State is the
  * latest view and the latest view-carrying click (greedy latest
  * predecessors, no consumption on match — a matched purchase leaves
  * the state untouched, exactly like the batch windows); each batch
  * walks its rows in (event-time, event_id) order, so matches fire
  * identically whether the three pattern events share a micro-batch or
  * arrive batches apart.
  */
class SeqDetectProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.Ev2, Streams.SeqMatch] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[Streams.SeqState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.SeqState]("seq",
      org.apache.spark.sql.Encoders.product[Streams.SeqState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.Ev2],
      tv: TimerValues): Iterator[Streams.SeqMatch] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var s = if (st.exists()) st.get()
      else Streams.SeqState(0L, 0L, 0L, 0L, 0L, 0L, hasV = false, hasC = false)
    val out = scala.collection.mutable.ArrayBuffer.empty[Streams.SeqMatch]
    sorted.foreach { e =>
      val us = Streams.usOf(e.ts)
      e.event_type match {
        case "view" =>
          s = s.copy(vUs = us, vId = e.event_id, hasV = true)
        case "click" =>
          if (s.hasV)
            s = s.copy(cvUs = s.vUs, cvId = s.vId, cUs = us, cId = e.event_id, hasC = true)
        case "purchase" =>
          if (s.hasC && us - s.cvUs <= Streams.SEQ_WIN)
            out += Streams.SeqMatch(user, s.cvId, s.cId, e.event_id, us - s.cvUs)
        case _ => ()
      }
    }
    st.update(s)
    out.iterator
  }
}


/** Streaming drawdown on v2 state: one (equity, peak) ValueState per
  * user, the exact-integer online form of [[Streams.drawdownRows]].
  * Each batch walks its flow rows in (event-time, event_id) order on
  * top of the carried pair, so equity and peak continue seamlessly
  * across micro-batches and stream == batch exactly.
  */
class DrawdownProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.EvT, Streams.DdOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[Streams.DdState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.DdState]("dd",
      org.apache.spark.sql.Encoders.product[Streams.DdState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.EvT],
      tv: TimerValues): Iterator[Streams.DdOut] = {
    val flows = rows.filter(e => e.event_type == "purchase" || e.event_type == "error")
      .toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var s = if (st.exists()) st.get() else Streams.DdState(0L, 0L)
    val out = flows.map { e =>
      val cents = BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(100)).toLongExact
      val flow = if (e.event_type == "purchase") cents else -cents
      val eq = s.eq + flow
      val peak = math.max(s.peak, math.max(0L, eq))
      s = Streams.DdState(eq, peak)
      Streams.DdOut(user, e.event_id, eq, peak, peak - eq)
    }
    if (flows.nonEmpty) st.update(s)
    out.iterator
  }
}

/** State-API-v2 processor for [[Streams.forecastRows]]'s online form:
  * one (l, b, cnt) ValueState per user. Each arriving event (sorted by
  * event time within the micro-batch, like [[DrawdownProcessor]]) is
  * scored against the prior state's one-step forecast l+b, THEN folded
  * into the Holt recursion — the exact double op order of the batch
  * fold, so stream == batch bit-for-bit.
  */
class ForecastProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.EvT, Streams.FcOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[Streams.FcState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.FcState]("fc",
      org.apache.spark.sql.Encoders.product[Streams.FcState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.EvT],
      tv: TimerValues): Iterator[Streams.FcOut] = {
    val evs = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var s = if (st.exists()) st.get() else Streams.FcState(0.0, 0.0, 0)
    val out = Seq.newBuilder[Streams.FcOut]
    evs.foreach { e =>
      if (s.cnt == 0) {
        s = Streams.FcState(e.value, 0.0, 1)
      } else {
        val f = s.l + s.b
        out += Streams.FcOut(user, e.event_id, s.cnt + 1, f, e.value - f)
        val nl = 0.5 * e.value + 0.5 * (s.l + s.b)
        val nb = 0.5 * (nl - s.l) + 0.5 * s.b
        s = Streams.FcState(nl, nb, s.cnt + 1)
      }
    }
    if (evs.nonEmpty) st.update(s)
    out.result().iterator
  }
}

/** State-API-v2 processor for [[Streams.decayedRows]]'s online form: one
  * (last_day, score, count) ValueState per item. Each arriving event
  * (sorted by event time within the micro-batch) right-shifts the score
  * by the day gap — the SAME per-step integer truncation as the batch
  * fold — then increments and emits the running row.
  */
class DecayProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.EvK, Streams.DcOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[Streams.DcState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.DcState]("dc",
      org.apache.spark.sql.Encoders.product[Streams.DcState], TTLConfig.NONE)

  override def handleInputRows(item: Long, rows: Iterator[Streams.EvK],
      tv: TimerValues): Iterator[Streams.DcOut] = {
    val evs = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var s = if (st.exists()) st.get() else Streams.DcState(0, 0L, 0)
    val out = Seq.newBuilder[Streams.DcOut]
    evs.foreach { e =>
      val day = (Streams.usOf(e.ts) / 86400000000L).toInt
      val score =
        if (s.cnt == 0) 1L
        else {
          // Clamp: an out-of-order arrival across micro-batches (input
          // contract is in-order per item, but TimeMode.None enforces no
          // watermark) would make the raw gap negative, and Java's shift
          // masking (gap & 63) would then produce garbage that also
          // diverges from the batch twin's `div shiftleft(...)` spelling.
          // A clamped gap of 0 means "same-day replay": score unchanged.
          val gap = math.max(0, day - s.lastDay)
          (if (gap > 62) 0L else s.score >> gap) + 1L
        }
      s = Streams.DcState(day, score, s.cnt + 1)
      out += Streams.DcOut(item, s.cnt, e.event_id, day, score)
    }
    if (evs.nonEmpty) st.update(s)
    out.result().iterator
  }
}

/** Running integer moments per event_type for the st22 3-sigma
  * guardrail: state is one exact (n, Σv_milli, Σv²_milli) triple on a
  * v2 `ValueState`; the flag inequality runs in BigInt (it reaches
  * ~10^20), mirroring the batch twin's DECIMAL(38,0) spelling
  * bit-for-bit. Proven equal to [[Streams.zscoreGuardrail]] in
  * StreamingSpec.
  */
class ZscoreProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, Streams.EvT, Streams.AnomalyOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig}

  @transient private var st: org.apache.spark.sql.streaming.ValueState[Streams.Moments] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.Moments]("zscore_moments",
      org.apache.spark.sql.Encoders.product[Streams.Moments], TTLConfig.NONE)

  override def handleInputRows(etype: String, rows: Iterator[Streams.EvT],
      tv: TimerValues): Iterator[Streams.AnomalyOut] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var m = if (st.exists()) st.get() else Streams.Moments(0L, 0L, 0L)
    val out = sorted.map { e =>
      val vm = BigDecimal(e.value * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val dev = BigInt(vm) * m.n - m.s
      val anomaly = m.n >= 10 &&
        dev * dev > 9 * (BigInt(m.n) * m.ss - BigInt(m.s) * m.s)
      val o = Streams.AnomalyOut(etype, e.event_id, (m.n + 1).toInt, m.n, anomaly)
      m = Streams.Moments(m.n + 1, m.s + vm, m.ss + vm * vm)
      o
    }
    if (sorted.nonEmpty) st.update(m)
    out.iterator
  }
}

/** Pending-view absence monitor (st23): per user, a ListState of views
  * awaiting a purchase, one event-time timer per view deadline. A
  * purchase converts every pending view whose 6-hour window covers it
  * (emitted immediately); an expired timer alerts every pending view
  * whose deadline the watermark has passed. Timers are never deleted —
  * a stale timer (its view already converted) finds no matching pending
  * entry and no-ops, which keeps two same-millisecond views from
  * sharing (and prematurely losing) one timer slot. State is O(pending
  * views per user), dropped at emission either way.
  */
class AbsenceProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Streams.EvT, Streams.AbsenceOut] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TimeMode, TimerValues, TTLConfig}

  @transient private var pend: ListState[Streams.PendingView] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pend = getHandle.getListState[Streams.PendingView]("pending_views",
      org.apache.spark.sql.Encoders.product[Streams.PendingView], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Streams.EvT],
      tv: TimerValues): Iterator[Streams.AbsenceOut] = {
    val sorted = rows.toSeq.sortBy(e => (Streams.usOf(e.ts), e.event_id))
    var cur = pend.get().toVector
    val before = cur
    val out = Vector.newBuilder[Streams.AbsenceOut]
    sorted.foreach { e =>
      val us = Streams.usOf(e.ts)
      e.event_type match {
        case "view" =>
          val dl = us / 1000L + Streams.ABSENCE_WIN_US / 1000L + 1
          cur :+= Streams.PendingView(e.event_id, us, dl)
          getHandle.registerTimer(dl)
        case "purchase" =>
          val (hit, keep) = cur.partition(p =>
            p.us < us && us <= p.us + Streams.ABSENCE_WIN_US)
          hit.foreach(p => out += Streams.AbsenceOut(user, p.event_id,
            p.deadlineMs, "converted", Some(e.event_id)))
          cur = keep
        case _ => ()
      }
    }
    if (cur != before) { pend.clear(); if (cur.nonEmpty) pend.put(cur.toArray) }
    out.result().iterator
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[Streams.AbsenceOut] = {
    val cur = pend.get().toVector
    val (expired, keep) = cur.partition(_.deadlineMs <= info.getExpiryTimeInMs)
    if (expired.nonEmpty) { pend.clear(); if (keep.nonEmpty) pend.put(keep.toArray) }
    expired.iterator.map(p =>
      Streams.AbsenceOut(user, p.event_id, p.deadlineMs, "alert", None))
  }
}

/** Sketch-in-state: per event_type, the k = 64 smallest DISTINCT 52-bit
  * user hashes on one ValueState array — the production pattern for
  * streaming cardinality (bounded state for unbounded keys). Each batch
  * merges its users' hashes and emits the current (n_sketch, kth,
  * estimate) row; the LAST row per type equals [[Streams.kmvByType]]
  * exactly (same md5-derived hashes, same (k−1)·2^52/h_k arithmetic,
  * same HALF_UP rounding at 4 decimals).
  */
class KmvProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, Streams.EvT, Streams.KmvOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig}

  private val K = 64
  private val KthNum = 63L * 4503599627370496L

  @transient private var st: org.apache.spark.sql.streaming.ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getListState[Long]("kmv",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  private def h52(u: Long): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13), 16)

  override def handleInputRows(etype: String, rows: Iterator[Streams.EvT],
      tv: TimerValues): Iterator[Streams.KmvOut] = {
    val cur = st.get().toArray
    val merged = (cur ++ rows.map(e => h52(e.user_id)).toArray)
      .distinct.sorted.take(K)
    st.clear(); st.put(merged)
    val n = merged.length
    val est =
      if (n < K) n.toDouble
      else BigDecimal(KthNum.toDouble / merged.last.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Iterator.single(Streams.KmvOut(etype, n.toLong, if (n == 0) 0L else merged.last, est))
  }
}
