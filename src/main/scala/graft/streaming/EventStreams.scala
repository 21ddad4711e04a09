package graft.streaming

import graft.ops.Events
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming path over the events table (SURVEY §7.3-3).
  *
  * The transforms are the SAME functions the graded batch queries use
  * ([[graft.ops.Events]]); here they run against `readStream` with a
  * watermark, which is exactly how the engine would consume a live event
  * feed: file/Kafka source → event-time windows → append sink. The
  * watermark bounds state: at 100 TB/day of events, state is
  * O(active windows × groups), not O(stream).
  */
object EventStreams {

  /** Streaming tumbling-window aggregation with a 1-hour watermark
    * (late events beyond the watermark are dropped — the late-data
    * policy under test in EventStreamSpec). */
  def tumblingStream(spark: SparkSession, dir: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) — same legacy-conf + µs
    // truncation as the batch reader (graft.ops.Relational.events);
    // guarded set: the builders we own set this at session build time
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the fixture is a bare file; FileStreamSource needs a directory, so
    // stream the parent dir with a glob filter selecting just events
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    Events.tumbling(stream.withWatermark("ts", "1 hour"))
  }

  /** Run the streaming aggregation to completion over the (bounded)
    * fixture directory via a memory sink; returns the final table.
    * AvailableNow processes the backlog in bounded batches and stops —
    * the batch-parity harness for streaming logic. Complete mode: append
    * mode would withhold the windows still open at end-of-backlog (their
    * watermark never passes), which is correct for an unbounded feed but
    * wrong for a bounded parity check. */
  def runToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    val q = tumblingStream(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming DEDUPLICATION under a watermark: the event stream is
    * deliberately DOUBLED (self-union — the at-least-once delivery a real
    * feed exhibits) and `dropDuplicatesWithinWatermark` on the event key
    * collapses it back; per-type counts over the deduped stream must
    * equal plain batch distinct counts, which is what the oracle checks.
    *
    * Scale notes: dedup state is one entry per key within the watermark
    * horizon — `dropDuplicatesWithinWatermark` evicts state once the
    * watermark passes a key's event time, so unbounded feeds hold
    * O(keys per watermark window) state, not O(stream). This is the
    * streaming face of the exact-dedup family (dd_exact's twin at the
    * delivery layer). */
  def dedupedStream(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def stream() = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("event_id"), col("event_type"), col("ts"))
    stream().unionByName(stream()) // simulated duplicate delivery
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
  }

  /** Graded entry: per-type counts after streaming dedup of the doubled
    * feed. Complete mode for the bounded-backlog parity (see
    * [[runToMemory]]). Oracle: batch COUNT(DISTINCT event_id). */
  def evStreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val name = "ev_stream_dedup_sink"
    spark.catalog.dropTempView(name)
    val q = dedupedStream(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy(col("event_type"))
  }

  def evStreamDedupOracle: String =
    """SELECT event_type, count(DISTINCT event_id) AS n_unique
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
