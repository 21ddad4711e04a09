package graft

import graft.ops.Events
import graft.streaming.EventStreams
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity (SURVEY §5): the streaming tumbling-window
  * aggregation over the bounded events fixture must equal the graded
  * batch twin — window() semantics are identical in both modes. */
class EventStreamSpec extends AnyFunSuite {

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
