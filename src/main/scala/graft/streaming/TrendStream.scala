package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.EventsQueries

/** Per-type online-regression state: first seen day, the five exact
  * integer moments over closed days (t = day − firstDay), and the open
  * day's partial count — eight longs per key, O(1) in event volume. */
case class TrendState(firstDay: Long, nd: Long, st: Long, stt: Long,
    sn: Long, stn: Long, snn: Long, openDay: Long, openCnt: Long)

/** One closed day's refreshed fit — slope/intercept over days seen so
  * far plus the one-step forecast, the live twin of a row of
  * `events_trend_forecast` restricted to the prefix. */
case class TrendOut(event_type: String, day: Long, n_days: Long,
    slope: Double, intercept: Double, forecast_next: Double)

/** Structured Streaming twin of `events_trend_forecast`: the throughput
  * trend as a LIVE monitor. Each closed day folds into the five moments
  * (all exact BIGINT — the batch query's contract), and the fit is
  * re-emitted from the updated moments; after the final day closes, the
  * last emission's numbers equal the batch query's row bit-for-bit
  * (spec-pinned). Earlier emissions are the prefix fits a dashboard
  * plots — a monitor cannot consult the future.
  *
  * Moment update is O(1) per closed day; no day list is retained, so
  * state never grows. Same straggler rule as the other day-monitors:
  * an event for an already-closed day drops like a post-watermark row.
  */
object TrendStream {

  val MinDays = 2 // a slope needs two points

  private def fn(eventType: String, events: Iterator[Event],
      state: GroupState[TrendState]): Iterator[TrendOut] = {
    val perDay = events.foldLeft(Map.empty[Long, Long]) { (m, e) =>
      val d = e.tsUs / EventsQueries.DayUs
      m.updated(d, m.getOrElse(d, 0L) + 1L)
    }
    var st = state.getOption
      .getOrElse(TrendState(-1L, 0L, 0L, 0L, 0L, 0L, 0L, -1L, 0L))
    val out = Seq.newBuilder[TrendOut]

    def closeOpenDay(): Unit = if (st.openDay >= 0) {
      val first = if (st.firstDay < 0) st.openDay else st.firstDay
      val t = st.openDay - first
      val n = st.openCnt
      val s2 = TrendState(first, st.nd + 1, st.st + t, st.stt + t * t,
        st.sn + n, st.stn + t * n, st.snn + n * n, -1L, 0L)
      val num = s2.nd * s2.stn - s2.st * s2.sn
      val den = s2.nd * s2.stt - s2.st * s2.st
      if (s2.nd >= MinDays && den > 0) {
        val slope = num.toDouble / den.toDouble
        val intercept = (s2.sn.toDouble - slope * s2.st) / s2.nd
        out += TrendOut(eventType, st.openDay, s2.nd, slope, intercept,
          intercept + slope * (t + 1L))
      }
      st = s2
    }

    perDay.keys.toSeq.sorted.foreach { d =>
      if (st.openDay < 0 || d >= st.openDay) {
        if (st.openDay >= 0 && d > st.openDay) closeOpenDay()
        st = st.copy(openDay = math.max(st.openDay, d),
          openCnt = (if (st.openDay == d) st.openCnt else 0L) + perDay(d))
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** events → per-closed-day refreshed fits; the final open day closes
    * only on a later-day (sentinel) event. */
  def fits(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[TrendOut] = {
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[TrendState, TrendOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
