package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.{EventsQueries, TrendQueries}

/** Per-type CUSUM accumulators: the open day plus the exact integer
  * cumulative numerator (Σ(cnt·ndRef − sRef)) and its running extremes —
  * the prefix-min identity's whole state, five longs per key. */
case class CusumState(openDay: Long, openCnt: Long, cum: Long,
    runmin: Long, runmax: Long)

/** Calibrated per-type reference: day count and total of the calibration
  * window (mean = sRef/ndRef kept as the exact pair), plus its σ. */
case class CusumRef(ndRef: Long, sRef: Long, sigma: Double)

/** One closed day's verdict — the batch `events_cusum_shift` row shape. */
case class CusumOut(event_type: String, day: Long, n_events: Long,
    cusum_up: Double, cusum_down: Double, is_shift: Boolean)

/** Structured Streaming twin of `events_cusum_shift`, deployed the way
  * CUSUM is actually deployed: CALIBRATE a reference (μ, σ) per type from
  * a history window, then MONITOR the live feed against it. The batch
  * query is the retrospective (its reference is the full series' own
  * mean); feeding the monitor a reference calibrated on that same series
  * reproduces the batch statistic bit-for-bit — the parity the spec pins.
  *
  * State is five longs per type: the cumulative numerator is kept in
  * exact integer units of ×ndRef (cnt·ndRef − sRef per closed day), so
  * running min/max never touch a float and restarts replay to identical
  * verdicts. A day closes when a later day's first event arrives;
  * stragglers for closed days are dropped like post-watermark rows. */
object CusumStream {

  /** Per-type reference from a calibration frame — day-count, total, and
    * σ exactly as the batch query derives them (collect is #types rows,
    * control-plane-sized). */
  def calibrate(events: DataFrame): Map[String, CusumRef] =
    events
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum("n").as("s"),
        sum(col("n") * col("n")).as("sq"))
      .collect()
      .map { r =>
        val (nd, s, sq) = (r.getLong(1), r.getLong(2), r.getLong(3))
        r.getString(0) -> CusumRef(nd, s,
          math.sqrt((sq.toDouble - s.toDouble * s / nd) / nd))
      }.toMap

  private def fn(refs: Map[String, CusumRef])(eventType: String,
      events: Iterator[Event],
      state: GroupState[CusumState]): Iterator[CusumOut] = {
    val ref = refs(eventType)
    val perDay = events.foldLeft(Map.empty[Long, Long]) { (m, e) =>
      val d = e.tsUs / EventsQueries.DayUs
      m.updated(d, m.getOrElse(d, 0L) + 1L)
    }
    var st = state.getOption.getOrElse(CusumState(-1L, 0L, 0L, 0L, 0L))
    val out = Seq.newBuilder[CusumOut]

    def closeOpenDay(): Unit = if (st.openDay >= 0) {
      val cum = st.cum + st.openCnt * ref.ndRef - ref.sRef
      val runmin = math.min(st.runmin, cum)
      val runmax = math.max(st.runmax, cum)
      val up = (cum - runmin).toDouble / ref.ndRef
      val down = (runmax - cum).toDouble / ref.ndRef
      out += CusumOut(eventType, st.openDay, st.openCnt, up, down,
        up > TrendQueries.CusumH * ref.sigma ||
          down > TrendQueries.CusumH * ref.sigma)
      st = CusumState(-1L, 0L, cum, runmin, runmax)
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

  /** events → per-closed-day CUSUM verdicts against the calibrated refs;
    * the final open day closes only on a later-day (sentinel) event. */
  def monitor(events: Dataset[Event], refs: Map[String, CusumRef])(
      implicit spark: SparkSession): Dataset[CusumOut] = {
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn(refs))
  }
}
