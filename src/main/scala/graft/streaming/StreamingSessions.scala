package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with EVENT-TIME TIMEOUTS —
  * `flatMapGroupsWithState` where a session closes either because a
  * later in-batch event exceeds the idle gap, or because the watermark
  * passes (last event + gap) with no successor (the timeout path that
  * batch sessionization, `Events.sessionize`, gets for free by seeing
  * the whole history).
  *
  * State per user: the single OPEN session (4 fields) with its timeout
  * registered at `end + gap` — O(active users) memory, closed sessions
  * emitted exactly once (Append mode).
  */
object StreamingSessions {

  case class Evt(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, ts_start_us: Long, ts_end_us: Long,
                           n_events: Long, sum_value: Double)

  val outputMode: OutputMode = OutputMode.Append()

  private def usOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  def update(gapUs: Long)(userId: Long, events: Iterator[Evt],
                          state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    def close(s: OpenSession) =
      ClosedSession(userId, s.startUs, s.endUs, s.n, s.sum)
    if (events.isEmpty && state.hasTimedOut) {
      val closed = state.getOption.map(close).iterator.toList
      state.remove()
      return closed.iterator
    }
    val sorted = events.toArray.sortBy(e => (usOf(e.ts), e.value))
    var open = state.getOption
    val closed = List.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val ts = usOf(e.ts)
      open match {
        case Some(s) if ts - s.endUs <= gapUs =>
          open = Some(OpenSession(s.startUs, math.max(s.endUs, ts), s.n + 1, s.sum + e.value))
        case Some(s) =>
          closed += close(s)
          open = Some(OpenSession(ts, ts, 1, e.value))
        case None =>
          open = Some(OpenSession(ts, ts, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close via watermark if no successor arrives within the gap
      state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L)
    }
    closed.result().iterator
  }

  /** `events` must carry the watermark (EventTimeTimeout requires one). */
  def apply(events: Dataset[Evt], gapUs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.EventTimeTimeout())(
        update(gapUs))
  }
}
