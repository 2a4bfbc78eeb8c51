package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming funnel tracking with explicit keyed state — the streaming
 * twin of [[graft.operators.Funnel]] (whose batch form is q73's exact
 * oracle for the in-order case): each user's greedy earliest-match
 * automaton advances as events arrive, and a row is emitted every time
 * the user reaches a NEW stage (stage, event time that reached it).
 *
 * State per key is O(1) — the automaton stage plus the (time, id) key of
 * the event that reached it, never the event history — so state-store
 * size is bounded by |users seen|, evicted after `idleTimeout` of
 * event-time silence past the watermark.
 *
 * Caveat vs batch (inherent to streaming sequence matching): the greedy
 * automaton consumes events in ARRIVAL-batch order (sorted within each
 * micro-batch); a step event arriving out of order across batches, with
 * an event time before the current match, cannot retroactively advance
 * the funnel. The batch operator over the same history is the
 * reconciliation path — StreamsSpec pins in-order agreement.
 */
object StatefulFunnel {

  final case class Event(user_id: Long, ts: Timestamp, event_id: Long,
                         event_type: String)
  final case class FunnelState(stage: Int, ms: Long, eid: Long)
  final case class StageReached(user_id: Long, stage: Long, ts: Timestamp,
                                converted: Boolean)

  /** The pure per-group automaton body of [[apply]]'s
    * flatMapGroupsWithState closure — public so a batch replay (declared
    * query q127) exercises the EXACT transition logic the stream runs
    * (sort by (event-time millis, event_id), greedy earliest-match,
    * O(1) carried state), not a re-implementation. Only the state-store
    * plumbing (GroupState update/timeout vs a cogrouped state table)
    * differs between stream and replay. */
  def transition(user: Long, events: Iterator[Event],
                 prev: Option[FunnelState],
                 steps: Seq[String]): (FunnelState, Seq[StageReached], Long) = {
    val sorted = events.toSeq
      .filter(e => steps.contains(e.event_type))
      .sortBy(e => (e.ts.getTime, e.event_id))
    var st = prev.getOrElse(FunnelState(0, Long.MinValue, 0L))
    val out = Seq.newBuilder[StageReached]
    sorted.foreach { e =>
      if (st.stage < steps.size && e.event_type == steps(st.stage)) {
        st = FunnelState(st.stage + 1, e.ts.getTime, e.event_id)
        out += StageReached(user, st.stage.toLong,
          new Timestamp(st.ms), st.stage == steps.size)
      }
    }
    (st, out.result(), sorted.lastOption.map(_.ts.getTime).getOrElse(Long.MinValue))
  }

  def apply(events: Dataset[Event], steps: Seq[String],
            watermark: String = "2 hours",
            idleMs: Long = 24L * 3600 * 1000): Dataset[StageReached] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (st, out, lastMs) =
              transition(user, it, state.getOption, steps)
            state.update(st)
            state.setTimeoutTimestamp(
              (if (lastMs == Long.MinValue) state.getCurrentWatermarkMs()
               else lastMs) + idleMs)
            out.iterator
          }
      }
  }
}
