package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.EventsQueries

/** Per-type running day-count statistics: closed-day count, exact integer
  * sum and sum of squares, plus the currently-open day's partial count. */
case class AnomState(nd: Long, s: Long, sq: Long, openDay: Long,
    openCnt: Long)

/** A flagged day — same column shape as a row of `events_anomaly_day`. */
case class AnomOut(event_type: String, day: Long, n_events: Long,
    z_score: Double)

/** Structured Streaming twin of `events_anomaly_day`: the ingest
  * data-quality gate as a live monitor. Keyed by event type, the state is
  * five longs — trailing closed-day stats (n, Σ, Σ²) plus the open day's
  * partial count; a day closes when a later day's first event arrives,
  * and is flagged against the trailing distribution INCLUDING itself
  * (mirroring the batch z formula, restricted to days seen so far — a
  * monitor cannot consult the future, so early days flag more readily
  * than in the batch retrospective; [[MinDays]] suppresses the cold
  * start).
  *
  * All accumulation is exact integer arithmetic; the z expression is the
  * batch query's, evaluated once per closed day. State is O(1) per type
  * regardless of event volume. Exactness envelope: Σcnt² must stay below
  * 2^53 for the z doubles to be exact (≈9.4e7 events/day/type over 100
  * days); past that, salt the type key or pre-sample — the variance
  * GUARD is overflow-proof (BigInt) either way.
  */
object AnomalyStream {

  val MinDays = 5 // closed days required before flagging

  private def fn(eventType: String, events: Iterator[Event],
      state: GroupState[AnomState]): Iterator[AnomOut] = {
    // batch rows arrive in arbitrary intra-batch order: reduce to per-day
    // counts first, then replay days in order (the feed is day-monotonic
    // ACROSS batches for an in-order stream, which is all that matters)
    val perDay = events.foldLeft(Map.empty[Long, Long]) { (m, e) =>
      val d = e.tsUs / EventsQueries.DayUs
      m.updated(d, m.getOrElse(d, 0L) + 1L)
    }
    var st = state.getOption.getOrElse(AnomState(0L, 0L, 0L, -1L, 0L))
    val out = Seq.newBuilder[AnomOut]

    def closeOpenDay(): Unit = if (st.openDay >= 0) {
      val (n, cnt) = (st.nd + 1, st.openCnt)
      val (s, sq) = (st.s + cnt, st.sq + cnt * cnt)
      // the variance guard in BigInt: sq*n overflows a Long at ~1e8
      // events/day × 100 days, and an overflowed guard silently stops
      // flagging. (Counts above ~9.4e7/day also push sq past 2^53 and
      // soften the z math itself — beyond that, salt the key or sample.)
      if (n >= MinDays && BigInt(sq) * n > BigInt(s) * s) {
        val z = (cnt - s.toDouble / n) /
          math.sqrt((sq.toDouble - s.toDouble * s / n) / n)
        if (math.abs(z) >= EventsQueries.ZThreshold)
          out += AnomOut(eventType, st.openDay, cnt, z)
      }
      st = AnomState(n, s, sq, -1L, 0L)
    }

    perDay.keys.toSeq.sorted.foreach { d =>
      // a straggler for an already-closed day is DROPPED, like an event
      // past the watermark — folding it into the open day would corrupt
      // that day's count and every downstream statistic
      if (st.openDay < 0 || d >= st.openDay) {
        if (st.openDay >= 0 && d > st.openDay) closeOpenDay()
        st = st.copy(openDay = math.max(st.openDay, d),
          openCnt = (if (st.openDay == d) st.openCnt else 0L) + perDay(d))
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** events → flagged days, append-per-closed-day. The final open day
    * never closes on its own — production feeds roll over daily, and the
    * spec closes it with a sentinel event. */
  def anomalies(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[AnomOut] = {
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[AnomState, AnomOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
