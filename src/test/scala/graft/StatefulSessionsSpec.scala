package graft.streaming

import graft.streaming.StatefulSessions.{SessionsState, UserEvent}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the stateful-sessionization transition function, driven
  * through Spark's public [[TestGroupState]] harness — this pins the
  * WATERMARK-GATED emission semantics (a session is emitted only once no
  * late event could still land inside it), which the bounded end-to-end
  * fixture in EventStreamSpec cannot distinguish from eager emission. */
class StatefulSessionsSpec extends AnyFunSuite {

  private val GapUs = 30L * 60 * 1000 * 1000
  private val HourUs = 3600L * 1000 * 1000

  private def ev(us: Long, v: Double = 1.0) =
    UserEvent(1L, new java.sql.Timestamp(us / 1000), v)

  private def st(prev: Option[SessionsState], wmMs: Long, timedOut: Boolean) =
    TestGroupState.create[SessionsState](
      prev.map(Optional.of[SessionsState]).getOrElse(Optional.empty[SessionsState]()),
      GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(java.lang.Long.valueOf(wmMs)), timedOut)

  test("nothing is emitted before the watermark passes a session's close") {
    // two sessions split by a >gap gap, all in one batch, watermark 0
    val s = st(None, 0L, timedOut = false)
    val out = StatefulSessions.transition(1L,
      Iterator(ev(0L), ev(60L * 1000000), ev(HourUs)), s).toList
    assert(out.isEmpty, "watermark has passed nothing — emission would be premature")
    assert(s.exists, "both sessions must be buffered in state")
    val stored = s.get
    assert(stored.pending.map(_.start_us) == List(0L))
    assert(stored.open.map(_.start_us).contains(HourUs))
    // timeout armed just past the earliest close
    assert(s.getTimeoutTimestampMs.get() == (60L * 1000000 + GapUs) / 1000 + 1)
  }

  test("watermark-passed sessions are emitted on timeout; later ones stay") {
    val s1 = st(None, 0L, timedOut = false)
    StatefulSessions.transition(1L, Iterator(ev(0L), ev(HourUs)), s1).toList
    // watermark just past first session's close (gap after ts 0)
    val wm1 = GapUs / 1000 + 1
    val s2 = st(Some(s1.get), wm1, timedOut = true)
    val out2 = StatefulSessions.transition(1L, Iterator.empty, s2).toList
    assert(out2.map(_.session_start_us) == List(0L))
    assert(out2.head.session_end_us == GapUs)
    assert(out2.head.n_events == 1)
    // the open second session survives
    assert(s2.get.open.map(_.start_us).contains(HourUs))
    assert(s2.get.pending.isEmpty)
    // watermark past everything → final session emitted, state dropped
    val wmEnd = (HourUs + GapUs) / 1000 + 1
    val s3 = st(Some(s2.get), wmEnd, timedOut = true)
    val out3 = StatefulSessions.transition(1L, Iterator.empty, s3).toList
    assert(out3.map(_.session_start_us) == List(HourUs))
    assert(s3.isRemoved, "all sessions emitted — state must be cleaned up")
  }

  test("late events older than the watermark are dropped, not resurrected") {
    // an emitted session's span must stay closed: a late event inside it
    // (older than the watermark) is discarded
    val s1 = st(None, 0L, timedOut = false)
    StatefulSessions.transition(1L, Iterator(ev(0L), ev(HourUs)), s1).toList
    val wm1 = GapUs / 1000 + 1
    val s2 = st(Some(s1.get), wm1, timedOut = true)
    StatefulSessions.transition(1L, Iterator.empty, s2).toList // emits session @0
    // late event at t=10min — inside the already-emitted session
    val s3 = st(Some(s2.get), wm1, timedOut = false)
    val out3 = StatefulSessions.transition(1L, Iterator(ev(10L * 60 * 1000000)), s3).toList
    assert(out3.isEmpty)
    assert(s3.get.open.map(_.start_us).contains(HourUs), "open session untouched")
    assert(s3.get.open.get.n == 1, "late event must not fold into any session")
    assert(s3.get.pending.isEmpty, "late event must not start a new pending session")
  }

  test("in-gap events extend the open session across batches (inclusive boundary)") {
    val s1 = st(None, 0L, timedOut = false)
    StatefulSessions.transition(1L, Iterator(ev(0L, 2.0)), s1).toList
    // second batch: event exactly `gap` later extends (matches session_window)
    val s2 = st(Some(s1.get), 0L, timedOut = false)
    StatefulSessions.transition(1L, Iterator(ev(GapUs, 3.0)), s2).toList
    val open = s2.get.open.get
    assert(open.start_us == 0L && open.last_us == GapUs)
    assert(open.n == 2 && open.sum == 5.0)
  }
}
