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
  * State is one small struct per ACTIVE user, hash-partitioned across
  * executors and checkpointed — at 100 TB/day event volume, state size
  * tracks concurrent users, not history.
  */
object SessionStream {

  val GapUs: Long = EventsQueries.SessionGapUs

  private def fn(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    def close(s: SessionState) =
      SessionOut(userId, s.sessionIdx, s.n, s.startUs, s.lastUs - s.startUs)

    if (state.hasTimedOut) {
      // emit the open session but KEEP the session counter: a closed
      // marker (n = 0) with no re-armed timeout, so the user's next
      // session continues the index sequence instead of restarting at 1
      val out = state.getOption.filter(_.n > 0).map(close).iterator
      state.getOption.foreach(s => state.update(s.copy(n = 0)))
      return out
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
          st = Some(SessionState(s.sessionIdx + 1, e.tsUs, e.tsUs, 1))
        case None =>
          st = Some(SessionState(1, e.tsUs, e.tsUs, 1))
      }
    }
    st.foreach { s =>
      state.update(s)
      if (s.n > 0)
        // fire when no on-time event can extend the session any more
        state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000 + 1)
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
