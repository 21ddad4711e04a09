package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom-state streaming sessionization (SURVEY §2.2 "stateful
  * streaming"; the `mapGroupsWithState`-class operator).
  *
  * Semantics match the batch/session_window twin
  * ([[graft.ops.Events.sessions]]): per-user sessions closed by a 30-min
  * inactivity gap (inclusive: an event exactly `gap` after the last one
  * extends the session, matching Spark's `session_window` merge rule),
  * `session_end = last event + gap`, value sums in event order.
  *
  * Emission is WATERMARK-GATED: a session — whether closed by an observed
  * gap or still open — is emitted only once the event-time watermark has
  * passed its close. `flatMapGroupsWithState` does not drop input rows
  * older than the watermark, so without the gate a late out-of-order
  * event arriving in a later micro-batch could fall inside an
  * already-emitted session and produce overlapping sessions in append
  * output. Gap-closed sessions are therefore buffered in state until the
  * watermark passes them; input rows older than the watermark are
  * dropped (standard late-data semantics, and what makes the
  * emitted-set append-only provable).
  *
  * Scale notes: state per user is the open session plus the gap-closed
  * sessions newer than the watermark — O(sessions per watermark delay),
  * not O(events); with a 1 s delay that is at most 2 per user on any
  * real-time feed (the bounded AvailableNow backlog is the worst case:
  * one batch holds a whole history, emitted when the post-batch
  * watermark advance triggers the timeout batch). The event-time timeout
  * guarantees cleanup: state is dropped once every session is emitted.
  * The shuffle partitions by user_id once; everything else is per-group
  * streaming compute.
  */
object StatefulSessions {

  private val GapMicros: Long = 30L * 60 * 1000 * 1000

  /** One event. `ts` stays a timestamp — the watermark is attached to
    * this attribute and event-time timeout requires it to survive into
    * the grouped Dataset. */
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double) {
    def ts_us: Long = ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }

  /** One session's bounds (epoch micros) + running aggregates. */
  final case class SessionAgg(start_us: Long, last_us: Long, n: Long, sum: Double)

  /** Per-user state: the open session plus gap-closed sessions still
    * awaiting the watermark. */
  final case class SessionsState(open: Option[SessionAgg], pending: List[SessionAgg])

  /** A closed session (same shape as the batch session_window query). */
  final case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  private def closeUs(s: SessionAgg): Long = s.last_us + GapMicros

  /** The per-group transition: fold this batch's non-late events (event-
    * time order) into the open session, buffering gap-closed sessions;
    * then emit every buffered/open session whose close the watermark has
    * passed. Invoked both with data and on event-time timeout (the
    * timeout path is the same emission logic with no new events). */
  private[streaming] def transition(
      userId: Long, events: Iterator[UserEvent],
      state: GroupState[SessionsState]): Iterator[SessionOut] = {
    val wmMs = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(SessionsState(None, Nil))
    var open = prev.open
    var pending = prev.pending
    // rows at/after the watermark only — flatMapGroupsWithState itself
    // does not filter late input
    events.toSeq.filter(_.ts_us / 1000 >= wmMs).sortBy(_.ts_us).foreach { e =>
      open = open match {
        case Some(s) if e.ts_us - s.last_us <= GapMicros =>
          Some(SessionAgg(s.start_us, math.max(s.last_us, e.ts_us), s.n + 1, s.sum + e.value))
        case Some(s) =>
          pending = s :: pending
          Some(SessionAgg(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          Some(SessionAgg(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    // watermark gate: close < watermark means no surviving event (all are
    // >= watermark) can extend or fall inside the session
    def emittable(s: SessionAgg): Boolean = closeUs(s) / 1000 < wmMs
    val openDone = open.filter(emittable)
    val emit = (pending.filter(emittable) ++ openDone).sortBy(_.start_us)
    val keepPending = pending.filterNot(emittable)
    val keepOpen = if (openDone.isDefined) None else open
    if (keepOpen.isEmpty && keepPending.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(SessionsState(keepOpen, keepPending))
      val nextCloseMs = (keepOpen.toList ++ keepPending).map(closeUs(_) / 1000).min
      // must be strictly beyond the current watermark
      state.setTimeoutTimestamp(math.max(nextCloseMs + 1, wmMs + 1))
    }
    emit.iterator.map(s => SessionOut(userId, s.start_us, closeUs(s), s.n, s.sum))
  }

  /** The streaming sessionization over the events fixture dir. */
  def sessionStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // nanos fixture gotcha — set defensively iff missing (the session
    // builders set it at build time; see graft.ops.Relational.events)
    graft.ops.Relational.ensureNanosAsLong(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val typed = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.ops.Relational.normalizeEventTs)
      .withWatermark("ts", "1 second")
      .select(col("user_id"), col("ts"), col("value"))
      .as[UserEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(transition)
      .toDF()
      .select(col("user_id"),
        timestamp_micros(col("session_start_us")).as("session_start"),
        timestamp_micros(col("session_end_us")).as("session_end"),
        col("n_events"),
        round(col("sum_value"), 4).as("sum_value"))
  }

  /** Run the bounded backlog to completion through a memory sink and
    * return the emitted sessions. Emission needs the watermark to pass a
    * session's close, so the final micro-batch (the one AvailableNow runs
    * after the watermark advances) emits everything except sessions
    * closing within the watermark delay of the stream's end — correct
    * append semantics; the batch twin is the total-session oracle. */
  def runToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    // fixed sink name, dropped first: repeated invocations (bench reps)
    // must not accumulate memory-sink tables in the session catalog
    spark.catalog.dropTempView(name)
    // streaming-sized state-store partition count (see
    // EventStreams.withStreamShuffle — 32 stores at toy scale is overhead)
    EventStreams.withStreamShuffle(spark) {
      val q = sessionStream(spark, dir).writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
  }

  /** Batch-graded entry: watermark-emitted sessions from the stateful
    * streaming path, ordered for determinism. Oracle-graded — the
    * emitted set is exactly the gaps-and-islands sessions whose close
    * the final watermark passed, and both the sessionization AND the
    * watermark gate are ANSI-expressible (see [[evSessionsStatefulOracle]]). */
  def evSessionsStateful(spark: SparkSession, dir: String): DataFrame =
    runToMemory(spark, dir, "ev_sessions_stateful_sink")
      .orderBy(col("user_id"), col("session_start"))

  /** DuckDB oracle: gaps-and-islands sessionization (inclusive 30-min
    * gap, same as [[graft.ops.Events.evSessionsOracle]]) filtered by the
    * emission gate the streaming run applies — a session is emitted iff
    * `floor(close_us/1000) < wm_ms` where `wm_ms = floor(max_ts_us/1000)
    * - 1000` (Spark tracks event-time stats in milliseconds and the
    * stream declares a 1 s watermark delay; the ms truncations mirror
    * [[transition]]'s arithmetic exactly). */
  def evSessionsStatefulOracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
      |), flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              <= INTERVAL '30 minutes'
      |         THEN 0 ELSE 1 END AS new_sess
      |  FROM e
      |), islands AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM flagged
      |), sess AS (
      |  SELECT user_id,
      |         min(ts) AS session_start,
      |         max(ts) + INTERVAL '30 minutes' AS session_end,
      |         count(*) AS n_events,
      |         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |  FROM islands GROUP BY user_id, sess
      |), wm AS (
      |  SELECT CAST(floor(epoch_us(max(CAST(ts AS TIMESTAMP))) / 1000) AS BIGINT) - 1000 AS wm_ms
      |  FROM e
      |)
      |SELECT user_id, session_start, session_end, n_events,
      |       round(sum_value, 4) AS sum_value
      |FROM sess, wm
      |WHERE CAST(floor(epoch_us(session_end) / 1000) AS BIGINT) < wm_ms
      |ORDER BY user_id, session_start""".stripMargin
}
