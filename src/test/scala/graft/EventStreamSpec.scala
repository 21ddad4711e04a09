package graft

import graft.ops.Events
import graft.streaming.EventStreams
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity (SURVEY §5): the streaming tumbling-window
  * aggregation over the bounded events fixture must equal the graded
  * batch twin — window() semantics are identical in both modes. */
class EventStreamSpec extends AnyFunSuite {

  test("stateful sessionization: closed sessions match batch session_window") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.StatefulSessions
      .evSessionsStateful(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("sum_value"), 4).as("s"))
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Events.evSessions(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events").cast("bigint"), round(col("sum_value"), 4).as("s"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    // every closed streamed session is exactly a batch session
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed-only sessions: ${missing.take(3)}")
    // only each user's final (still-open) session may be absent
    val users = batch.map(_.head).size
    assert(batch.size - streamed.size <= users)
  }

  test("stream-stream interval join == batch interval join") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    // sf0.01: the sf0.001 slice has too few view→click pairs inside 10 min
    val dir = "/root/testdata/sf0.01"
    val streamed = EventStreams.evStreamJoin(spark, dir)
      .collect().map(_.toSeq).toSet
    val ev = graft.ops.Relational.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    val batch = v.join(c,
        col("user_id") === col("c_user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr("interval 10 minutes"))
      .select(col("user_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("gap_us")).cast("double") / count(lit(1)) / 1000000.0, 4)
          .as("avg_gap_s"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream-static enrich join == batch CASE-join aggregate") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val dir = TestSpark.Sf0001
    val streamed = EventStreams.evStreamEnrich(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Relational.events(spark, dir)
      .withColumn("tier",
        when(col("user_id") % 3 === 0, "gold")
          .when(col("user_id") % 3 === 1, "silver")
          .otherwise("bronze"))
      .groupBy(col("tier"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch,
      "stream-static enrichment must equal the batch twin exactly")
  }

  test("transformWithState profiles == batch per-user aggregates") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.UserProfiles
      .evUserProfile(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Relational.events(spark, TestSpark.Sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        max(col("value")).as("max_value"),
        max(col("ts")).as("last_ts"))
      .orderBy(col("user_id"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming dedup collapses a doubled feed to batch distinct counts") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.evStreamDedup(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.Relational.events(spark, TestSpark.Sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("n_unique"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming dedup is store-agnostic: RocksDB state store == batch distinct") {
    // HDFSBackedStateStore keeps state on-heap — fine for bounded
    // backlogs, an OOM at 100 TB state. This pins that the same query
    // runs unchanged (and correctly) on the spill-capable RocksDB store,
    // which is the production provider the SCALE.md state-size notes
    // assume. transformWithState already requires RocksDB
    // (UserProfiles); this covers the dropDuplicatesWithinWatermark path.
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventStreams.evStreamDedup(spark, TestSpark.Sf0001)
        .collect().map(_.toSeq).toSet
      val batch = graft.ops.Relational.events(spark, TestSpark.Sf0001)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("event_id")).as("n_unique"))
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed == batch)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming tumbling windows == batch tumbling windows") {
    val spark = TestSpark.spark
    val streamed = EventStreams.runToMemory(spark, TestSpark.Sf0001, "ev_parity")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = Events.evTumbling(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
