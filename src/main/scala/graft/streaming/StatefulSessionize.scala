package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming sessionization with explicit keyed state (the custom-state
 * tier of the reference's freshness concern, README.md:83,117)
 * (`flatMapGroupsWithState`) — the custom-state streaming surface
 * complementing [[Streams.sessionWindows]]' built-in `session_window`.
 *
 * Why explicit state when `session_window` exists: the state here is an
 * arbitrary case class, so this shape extends to stateful enrichment the
 * built-in can't express (per-device rolling counters feeding early-signal
 * thresholds, dedup-within-key, custom eviction). Sessionization doubles
 * as the reference implementation because the batch operator
 * ([[graft.operators.Sessionize]]) gives it an exact oracle.
 *
 * Semantics: events for a user belong to one session while consecutive
 * gaps are ≤ `gapSeconds`. A session is emitted when a later event in the
 * same key exceeds the gap (in-batch close) or when the event-time
 * watermark passes `last_event + gap` (timeout close). State per key is
 * O(1) — only the open session, never the event history — so state-store
 * size is bounded by |active keys| at any scale.
 */
object StatefulSessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Int)
  final case class Session(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                           n_events: Int, duration_sec: Long)

  private def close(user: Long, s: OpenSession): Session =
    Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n,
      (s.lastMs - s.startMs) / 1000)

  def apply(events: Dataset[Event], gapSeconds: Long,
            watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(user, _)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += close(user, s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
