package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.EventsQueries

/** An open per-user session: running index, bounds, and event count. */
case class SessionState(sessionIdx: Long, startUs: Long, lastUs: Long,
    n: Long)

/** A closed session — identical shape to a row of `events_sessionize`. */
case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
    start_us: Long, duration_us: Long)

/** Structured Streaming twin of `events_sessionize`: 30-minute-gap sessions
  * per user via `flatMapGroupsWithState` with an EVENT-TIME TIMEOUT — the
  * streaming-native way to close a session that no further event will ever
  * extend. A session is emitted either when a same-user event arrives past
  * the gap (in-stream close) or when the watermark passes
  * `last_event + gap` (timeout close); the two paths together produce
  * exactly the batch gaps-and-islands result for an in-order feed.
  *
  * State is one small struct per user seen within the marker TTL
  * ([[SessionStream.MarkerTtlMs]]), hash-partitioned across executors and
  * checkpointed — at 100 TB/day event volume, state size tracks the
  * recently-active user set, not all history.
  */
object SessionStream {

  val GapUs: Long = EventsQueries.SessionGapUs

  /** How long a closed-session marker (which preserves the user's session
    * counter) survives past the session's close before being
    * garbage-collected. Bounds keyed state to users active within this
    * horizon — the price is that a user idle longer restarts session
    * numbering at 1.
    *
    * The restart is decided in EVENT TIME (next event vs the marker's
    * close + TTL), never by when the physical timeout happened to fire:
    * the physical expiry can only lag the event-time one (the watermark
    * when an event is processed is ≤ its timestamp), so numbering is a
    * pure function of the feed, not of micro-batch chunking — asserted
    * across random replays in SessionStreamSpec. Size it above the
    * longest idle gap that should keep its numbering (7 days here, above
    * the fixture's inter-session gaps). */
  val MarkerTtlMs: Long = 7L * 24 * 3600 * 1000

  private val MarkerTtlUs: Long = MarkerTtlMs * 1000

  private def fn(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    def close(s: SessionState) =
      SessionOut(userId, s.sessionIdx, s.n, s.startUs, s.lastUs - s.startUs)

    // a timeout timestamp in the past would throw; clamp to just past the
    // current watermark (late events can legitimately produce one)
    def armTimeout(atMs: Long): Unit =
      state.setTimeoutTimestamp(
        math.max(atMs, state.getCurrentWatermarkMs() + 1))

    if (state.hasTimedOut) {
      state.getOption match {
        case Some(s) if s.n > 0 =>
          // emit the open session but KEEP the session counter as a
          // closed marker (n = 0) so the user's next session continues
          // the index sequence; the marker's expiry is anchored to the
          // session's own close time — a pure function of the event
          // feed, so numbering cannot depend on micro-batch chunking
          state.update(s.copy(n = 0))
          armTimeout((s.lastUs + GapUs) / 1000 + MarkerTtlMs)
          return Iterator.single(close(s))
        case _ =>
          state.remove() // marker TTL expired — drop the counter
          return Iterator.empty
      }
    }

    var st = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    // arrival order within a micro-batch is not event order
    events.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      st match {
        case Some(s) if s.n > 0 && e.tsUs - s.lastUs <= GapUs =>
          st = Some(s.copy(lastUs = math.max(s.lastUs, e.tsUs), n = s.n + 1))
        case Some(s) =>
          if (s.n > 0) closed += close(s)
          // continue the index only within the marker's EVENT-TIME TTL
          // window ((prev close) + TTL); deciding by event time — not by
          // whether the physical timeout already removed the marker —
          // keeps numbering feed-deterministic under any chunking
          val base =
            if (e.tsUs - (s.lastUs + GapUs) > MarkerTtlUs) 0L
            else s.sessionIdx
          st = Some(SessionState(base + 1, e.tsUs, e.tsUs, 1))
        case None =>
          st = Some(SessionState(1, e.tsUs, e.tsUs, 1))
      }
    }
    st.foreach { s =>
      state.update(s)
      if (s.n > 0)
        // fire when no on-time event can extend the session any more
        armTimeout((s.lastUs + GapUs) / 1000 + 1)
    }
    closed.result().iterator
  }

  def sessions(events: Dataset[Event])(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("tsUs")))
      .withWatermark("event_time", "0 seconds")
      .as[Event]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
