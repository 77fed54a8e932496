package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the ingest stream (µs event time). */
case class RawEvent(eventId: Long, ts: Long, userId: Long, eventType: String)

/** Streaming twin of `events_window_dedup`'s lag rule: an event is a
  * retransmission when the SAME (user, type) fired within
  * [[graft.events.LifecycleQueries.DedupWindowUs]] before it — compared
  * to its immediate PREDECESSOR (kept or dropped), not to the last kept
  * event. The lag rule is what makes the streaming state O(1) per key:
  * one long (last-seen ts), updated unconditionally. A debounce-to-
  * first rule (`dropDuplicatesWithinWatermark`'s shape) would re-admit
  * the third event of a tight burst once it drifts past the window of
  * the FIRST — the lag rule suppresses the whole burst, which is the
  * retransmission semantics the batch query defines.
  *
  * Events are folded in (ts, eventId) order within each micro-batch;
  * cross-batch order is the source's responsibility (the same contract
  * as every streaming twin here). State is hash-partitioned by
  * (user, type) and checkpointed — at 100 TB/day the key space is
  * users × types and 8 bytes each, far under executor memory; add a
  * state TTL (GroupStateTimeout.ProcessingTimeTimeout) in production to
  * age out departed users.
  */
object WindowDedupStream {

  val WindowUs: Long = graft.events.LifecycleQueries.DedupWindowUs

  /** Fold one micro-batch of one key's events over the last-seen ts. */
  def process(key: (Long, String), evs: Iterator[RawEvent],
      state: GroupState[Long]): Iterator[RawEvent] = {
    val sorted = evs.toSeq.sortBy(e => (e.ts, e.eventId))
    var prev: Option[Long] = if (state.exists) Some(state.get) else None
    val kept = sorted.filter { e =>
      val keep = prev.forall(p => e.ts - p > WindowUs)
      prev = Some(e.ts)
      keep
    }
    prev.foreach(state.update)
    kept.iterator
  }

  /** Stream (or batch — flatMapGroupsWithState folds with empty state)
    * of first-signal events, retransmissions suppressed. */
  def dedup(events: Dataset[RawEvent]): Dataset[RawEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.userId, e.eventType))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }
}
