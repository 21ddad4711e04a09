package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-window analytics over the `events` table (SURVEY §7.3-3).
  *
  * The window transforms are written once against a generic DataFrame and
  * reused by BOTH the batch queries below (graded against the DuckDB
  * oracle) and the Structured Streaming path in
  * [[graft.streaming.EventStreams]] — `window()`/`session_window` have
  * identical semantics in batch and streaming, so the batch oracle also
  * validates the streaming logic.
  */
object Events {
  import Relational.events

  /** Exact, order-independent sum of a double column (see Relational). */
  private def dsum(c: org.apache.spark.sql.Column, alias: String) =
    sum(c.cast("decimal(28,6)")).cast("double").as(alias)

  /** Tumbling 1-hour windows × event_type. Epoch-aligned, so the window
    * start equals date_trunc('hour') — that's the oracle formulation. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), "sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  def evTumbling(spark: SparkSession, dir: String): DataFrame =
    tumbling(events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  def evTumblingOracle: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |       event_type, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Sliding windows: 1 hour long, every 30 minutes — each event lands in
    * exactly 2 windows. The oracle unnests the same two epoch-aligned
    * starts per event. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), "sum_value"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_value"))

  def evSliding(spark: SparkSession, dir: String): DataFrame =
    sliding(events(spark, dir)).orderBy(col("window_start"))

  def evSlidingOracle: String =
    """SELECT ws AS window_start, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT unnest([
      |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
      |    time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'
      |  ]) AS ws, value
      |  FROM events) x
      |GROUP BY ws
      |ORDER BY window_start""".stripMargin

  /** Session windows per user: 30-minute inactivity gap. Streaming-native
    * operator exercised in batch; oracle-graded via the gaps-and-islands
    * ANSI formulation (lag + cumulative new-session flags — DuckDB has no
    * session windows, but 30-min-gap sessionization is SQL-expressible).
    * Spark's merge rule is INCLUSIVE at the boundary (an event exactly
    * `gap` after the last one extends the session — verified empirically,
    * 3 events 30 min apart form 1 session), hence the oracle's `<=`. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), "sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  def evSessions(spark: SparkSession, dir: String): DataFrame =
    sessions(events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  def evSessionsOracle: String =
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
      |)
      |SELECT user_id,
      |       min(ts) AS session_start,
      |       max(ts) + INTERVAL '30 minutes' AS session_end,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM islands
      |GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin

  /** Per-user event sequencing: previous event type and seconds since it
    * (lag over an event-time window) — the batch twin of a
    * mapGroupsWithState sequence feature. Oracle-checked. */
  def evUserSequence(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events(spark, dir)
      .filter(col("user_id") < 50)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("secs_since_prev",
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .cast("double") / 1e6)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("prev_type"), round(col("secs_since_prev"), 3).as("secs_since_prev"))
      .orderBy(col("user_id"), col("event_id"))
  }

  def evUserSequenceOracle: String =
    """SELECT user_id, event_id, event_type,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  round(CAST(epoch_us(CAST(ts AS TIMESTAMP)) -
      |        lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS DOUBLE) / 1e6, 3)
      |    AS secs_since_prev
      |FROM events
      |WHERE user_id < 50
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY user_id, event_id""".stripMargin

  /** Ordered funnel: signup → first view AFTER the signup → first click
    * AFTER that view, per user; output is users surviving each stage.
    * The ORDER constraint (each stage strictly after the previous) is
    * what separates a funnel from three independent counts.
    *
    * Shape at 100 TB: three per-user min-aggregates (each a map-side
    * partial collapse to ≤1 row per user per stage) chained by per-user
    * joins — every shuffle is keyed on user_id and carries one row per
    * user, so AQE can even reuse the exchange; nothing event-sized
    * crosses a join. Oracle-checked. */
  def evFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view").join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "click").join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val stages = Seq(("1_signup", s1), ("2_view_after_signup", s2),
      ("3_click_after_view", s3))
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    }.reduce(_ unionByName _).orderBy(col("stage"))
  }

  def evFunnelOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
      |), s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'signup'
      |  GROUP BY user_id
      |), s2 AS (
      |  SELECT ev.user_id, min(ts) AS t2 FROM ev JOIN s1 USING (user_id)
      |  WHERE event_type = 'view' AND ts > t1 GROUP BY ev.user_id
      |), s3 AS (
      |  SELECT ev.user_id, min(ts) AS t3 FROM ev JOIN s2 USING (user_id)
      |  WHERE event_type = 'click' AND ts > t2 GROUP BY ev.user_id
      |)
      |SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
      |UNION ALL
      |SELECT '2_view_after_signup', count(*) FROM s2
      |UNION ALL
      |SELECT '3_click_after_view', count(*) FROM s3
      |ORDER BY stage""".stripMargin

  /** Weekly cohort retention: users bucketed by the week of their FIRST
    * event; each later active week counts them at that week offset — the
    * retention triangle every growth dashboard draws.
    *
    * Shape at 100 TB: first-seen is one per-user min-aggregate; the
    * activity grid dedups (user, week) map-side before the final
    * cohort-sized aggregate. Both week truncations are Monday-aligned in
    * Spark and DuckDB, so the offsets match exactly. Oracle-checked. */
  def evCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    ev.join(first, "user_id")
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def evCohortsOracle: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |         date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events
      |), first AS (
      |  SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id
      |)
      |SELECT cohort_week,
      |       CAST(date_diff('week', cohort_week, wk) AS INTEGER) AS week_offset,
      |       count(DISTINCT user_id) AS n_users
      |FROM ev JOIN first USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Event-rate anomaly detection: per event type, flag hourly buckets
    * whose count deviates from the trailing-8-bucket mean by more than
    * 3σ — the ingestion-monitoring operator that catches a stuck
    * producer (rate collapse) or a runaway retry loop (spike) before it
    * poisons a training snapshot.
    *
    * Cross-engine float discipline: the trailing mean/variance come from
    * INTEGER frame sums (Σc, Σc²) — `var = (k·Σc² − (Σc)²)/k²` — so
    * both engines do identical exact BIGINT arithmetic until one final
    * division/sqrt; a windowed `stddev()` would accumulate doubles in
    * engine-specific order. Only warm buckets (full 8-bucket history)
    * emit; a constant-rate history (var = 0) yields a NULL z on both
    * engines.
    *
    * Buckets with zero events produce no row, so the frame spans the 8
    * previous OBSERVED buckets; production densifies against a calendar
    * spine (a `sequence()` range join — control-plane-sized) when
    * true-zero detection matters.
    *
    * Shape at 100 TB: one tumbling pre-aggregate (map-side combine to
    * ≤ types × buckets rows), then ordered frames PARTITIONED BY
    * event_type — keys parallelize, per-key state is the O(8) frame;
    * nothing corpus-sized crosses the exchange. Oracle-checked. */
  def evAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frame = Window.partitionBy(col("event_type"))
      .orderBy(col("bucket")).rowsBetween(-8, -1)
    events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      // pre-project the square: windowing over a DERIVED expression
      // splits into a second Window operator (extracted projection);
      // over plain attributes all three functions fuse into one pass
      .withColumn("cnt2", col("cnt") * col("cnt"))
      .withColumn("k", count(col("cnt")).over(frame))
      .withColumn("s", sum(col("cnt")).over(frame))
      .withColumn("ss", sum(col("cnt2")).over(frame))
      .where(col("k") === 8)
      .withColumn("varx",
        (col("k") * col("ss") - col("s") * col("s")).cast("double") /
          (col("k") * col("k")).cast("double"))
      .select(col("event_type"), col("bucket"), col("cnt"),
        when(col("varx") > 0,
          round((col("cnt").cast("double") - col("s").cast("double") / col("k")) /
            sqrt(col("varx")), 4)).as("z"))
      .withColumn("is_spike", coalesce(abs(col("z")) > 3.0, lit(false)))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Calendar densification: hourly event counts over a generated
    * complete hour spine, zero-filled — the step that turns "no row" into
    * "count 0" so downstream gates ([[evAnomaly]]'s trailing frames,
    * SLA monitors) can tell a silent producer from a missing bucket.
    *
    * Shape at 100 TB: the ONLY corpus-sized work is the one map-side-
    * combined hourly aggregate; the spine comes from a single-row
    * min/max aggregate expanded with `sequence()` (calendar-sized — ~9k
    * rows/year), and the zero-fill join is spine ⋈ hourly-counts, both
    * control-plane-sized however large the corpus. Spark broadcasts the
    * 1-row bounds implicitly; nothing re-scans. Oracle-checked. */
  def evGapfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val spine = ev
      .agg(date_trunc("hour", min(col("ts"))).as("t0"),
        date_trunc("hour", max(col("ts"))).as("t1"))
      .select(explode(sequence(col("t0"), col("t1"),
        expr("interval 1 hour"))).as("bucket"))
    spine.join(hourly, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(col("bucket"))
  }

  def evGapfillOracle: String =
    """WITH b AS (
      |  SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS t0,
      |         date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS t1
      |  FROM events
      |), spine AS (
      |  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket FROM b
      |), hourly AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, count(*) AS cnt
      |  FROM events GROUP BY 1
      |)
      |SELECT s.bucket, CAST(coalesce(h.cnt, 0) AS BIGINT) AS cnt
      |FROM spine s LEFT JOIN hourly h USING (bucket)
      |ORDER BY bucket""".stripMargin

  def evAnomalyOracle: String =
    """WITH b AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |), f AS (
      |  SELECT event_type, bucket, cnt,
      |         count(cnt) OVER w AS k,
      |         sum(cnt)   OVER w AS s,
      |         sum(cnt * cnt) OVER w AS ss
      |  FROM b
      |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
      |               ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_type, bucket, cnt,
      |       CASE WHEN (k*ss - s*s) > 0 THEN
      |         round((CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE)/k) /
      |               sqrt(CAST(k*ss - s*s AS DOUBLE)/(k*k)), 4)
      |       END AS z,
      |       coalesce(abs(CASE WHEN (k*ss - s*s) > 0 THEN
      |         round((CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE)/k) /
      |               sqrt(CAST(k*ss - s*s AS DOUBLE)/(k*k)), 4)
      |       END) > 3.0, false) AS is_spike
      |FROM f WHERE k = 8
      |ORDER BY event_type, bucket""".stripMargin
}
