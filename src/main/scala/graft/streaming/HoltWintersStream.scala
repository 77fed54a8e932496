package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One day's observation on a metric series. */
case class DayCount(series: String, day: Long, n: Long)

/** A fitted point emitted once the model is warm. */
case class HwFit(series: String, day: Long, x: Double, level: Double,
    trend: Double, seasonal: Double, fitted: Double)

/** Per-series Holt–Winters state: `buf` holds the init window until two
  * full weeks have arrived; after init, (l, b, s) carry the recursion. */
case class HwState(initialized: Boolean, l: Double, b: Double,
    s: Seq[Double], buf: Seq[(Long, Long)])

/** Streaming twin of `events_holt_winters`: the same triple-smoothing
  * recursion as Spark-managed keyed state, one (l, b, s[7]) tuple per
  * series. The first two weeks buffer for initialization (means over
  * EXACT integer sums, then a silent replay of week two — exactly the
  * batch fold's warm-up); every later day updates the state and emits
  * its fitted point. Because the update arithmetic is written as the
  * identical IEEE op sequence, the emitted doubles are bit-equal to
  * the batch query's fit rows (the parity spec asserts ==, not ≈).
  *
  * Keyed by series id: at 100 TB this is thousands of independent
  * metric series, each carrying 9 doubles of state, hash-partitioned
  * and checkpointed — the standard streaming-forecaster shape.
  */
object HoltWintersStream {

  val Period = 7

  private def weekday(day: Long): Int = (((day + 3) % 7) + 7).toInt % 7

  /** One update step — the batch fold's lambda, in plain Scala with the
    * same literals and op order. Returns (newState, emitted point). */
  def step(series: String, st: HwState, day: Long, n: Long)
      : (HwState, HwFit) = {
    val w = weekday(day)
    val x = n.toDouble
    val sw = st.s(w)
    val fitted = st.l + st.b + sw
    val l2 = 0.3 * (x - sw) + (1.0 - 0.3) * (st.l + st.b)
    val b2 = 0.1 * (l2 - st.l) + (1.0 - 0.1) * st.b
    val s2 = st.s.updated(w, 0.2 * (x - l2) + (1.0 - 0.2) * sw)
    (HwState(initialized = true, l2, b2, s2, Nil),
      HwFit(series, day, x, l2, b2, sw, fitted))
  }

  /** Fold a batch of one series' days over the state. Emits only
    * post-init points; the second init week replays silently. */
  def process(series: String, days: Iterator[DayCount],
      state: GroupState[HwState]): Iterator[HwFit] = {
    var st = if (state.exists) state.get
      else HwState(initialized = false, 0.0, 0.0, Nil, Nil)
    val out = Seq.newBuilder[HwFit]
    days.toSeq.sortBy(_.day).foreach { dc =>
      if (st.initialized) {
        val (st2, fit) = step(series, st, dc.day, dc.n)
        st = st2
        out += fit
      } else {
        val buf = st.buf :+ (dc.day, dc.n)
        if (buf.size < 2 * Period) st = st.copy(buf = buf)
        else {
          // init from the two buffered weeks (exact integer sums), then
          // replay week two without emitting — the batch fold's warm-up
          val m1 = buf.take(Period).map(_._2).sum.toDouble / 7.0
          val m2 = buf.slice(Period, 2 * Period).map(_._2).sum.toDouble / 7.0
          // a weekday absent from the init week (day gaps) defaults its
          // seasonal slot to 0.0 — the batch fold's defined behavior
          // (SeasonalQueries.hwFits coalesces the same way); a bare .get
          // here used to crash the query on gapped fixtures. First match
          // wins on duplicated weekdays, like element_at(filter(...), 1).
          val s0 = (0 until Period).map { j =>
            buf.take(Period).find(d => weekday(d._1) == j)
              .map(_._2.toDouble - m1).getOrElse(0.0)
          }
          st = HwState(initialized = true, m1, (m2 - m1) / 7.0, s0, Nil)
          buf.slice(Period, 2 * Period).foreach { case (d, n) =>
            st = step(series, st, d, n)._1
          }
        }
      }
    }
    if (st.initialized || st.buf.nonEmpty) state.update(st)
    out.result().iterator
  }

  def fits(days: Dataset[DayCount]): Dataset[HwFit] = {
    import days.sparkSession.implicits._
    days.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }
}
