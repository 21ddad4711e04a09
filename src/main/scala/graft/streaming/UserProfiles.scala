package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Per-user profile accumulation on the NEW arbitrary-state API
  * (`transformWithState`, Spark 4.x) — the modern successor to
  * `flatMapGroupsWithState` that [[StatefulSessions]] exercises:
  * explicit named state handles (`ValueState`/`ListState`/`MapState`),
  * per-state TTL, timers, and a RocksDB-backed store.
  *
  * The operator keeps one running [[UserProfiles.Profile]] per user —
  * event/click counts, max value, last event time — the shape of a
  * feature-store "user profile" a training pipeline maintains over an
  * event firehose. Statistics are deliberately order-insensitive
  * (counts/max), so results are deterministic under any batch/partition
  * split, which is what lets the driver hash-compare the streaming
  * result against a plain batch aggregate.
  *
  * Scale notes: state is one fixed-size Profile per user in RocksDB —
  * memory-bounded regardless of key cardinality (the HDFS-backed store
  * keeps state on-heap; RocksDB spills, which is why transformWithState
  * requires it). One shuffle on user_id; per-batch compute is O(rows).
  * In production the profile would carry `TTLConfig` so dormant users
  * age out — TTL is processing-time-based and therefore nondeterministic,
  * so the graded query keeps `TTLConfig.NONE`.
  */
object UserProfiles {

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double) {
    def ts_us: Long = ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }

  /** The per-user running state (fixed size; order-insensitive fields). */
  final case class Profile(n_events: Long, n_clicks: Long, max_value: Double, last_us: Long)

  final case class ProfileOut(
      user_id: Long, n_events: Long, n_clicks: Long, max_value: Double, last_us: Long)

  /** The stateful processor: fold the batch's rows into the stored
    * profile, emit the updated profile once per key per batch. */
  class ProfileProcessor extends StatefulProcessor[Long, UserEvent, ProfileOut] {
    @transient private var profile: ValueState[Profile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[Profile](
        "profile", Encoders.product[Profile], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[ProfileOut] = {
      var p = if (profile.exists()) profile.get() else Profile(0L, 0L, Double.MinValue, Long.MinValue)
      rows.foreach { e =>
        p = Profile(
          n_events = p.n_events + 1,
          n_clicks = p.n_clicks + (if (e.event_type == "click") 1 else 0),
          max_value = math.max(p.max_value, e.value),
          last_us = math.max(p.last_us, e.ts_us))
      }
      profile.update(p)
      Iterator.single(ProfileOut(key, p.n_events, p.n_clicks, p.max_value, p.last_us))
    }
  }

  /** The streaming profile query over the events fixture dir. */
  def profileStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Relational.ensureNanosAsLong(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.ops.Relational.normalizeEventTs)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Run the bounded backlog through a memory sink; the single
    * AvailableNow batch yields exactly one profile row per user. */
  def runToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.catalog.dropTempView(name)
    // transformWithState requires the RocksDB store; scope the provider
    // switch to this query and restore the session's previous value
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      EventStreams.withStreamShuffle(spark) {
        val q = profileStream(spark, dir).writeStream
          .outputMode("update")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    spark.table(name)
  }

  /** Graded entry: final per-user profiles, presentation-shaped.
    * Oracle-graded — every profile field is an order-insensitive
    * aggregate a plain GROUP BY reproduces. */
  def evUserProfile(spark: SparkSession, dir: String): DataFrame =
    runToMemory(spark, dir, "ev_user_profile_sink")
      .select(col("user_id"), col("n_events"), col("n_clicks"),
        col("max_value"),
        timestamp_micros(col("last_us")).as("last_ts"))
      .orderBy(col("user_id"))

  def evUserProfileOracle: String =
    """SELECT user_id,
      |  count(*) AS n_events,
      |  count(*) FILTER (event_type = 'click') AS n_clicks,
      |  max(value) AS max_value,
      |  max(CAST(ts AS TIMESTAMP)) AS last_ts
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
}
