package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.EventsQueries

/** Decay-counter state: the anchor day, the decayed weight AT that
  * anchor, and the lifetime event count. Fixed size per key forever. */
case class DecayState(day: Long, weight: Double, n: Long)

/** Per-type decayed-count snapshot emitted each micro-batch. */
case class DecayRow(event_type: String, day: Long, n_events: Long,
    decayed_weight: Double)

/** Streaming twin of `events_decayed_counts`: a keyed exponential-decay
  * counter (1-day half-life) maintained in `flatMapGroupsWithState`.
  *
  * The arithmetic is engineered so the state is EXACT, not approximately
  * decayed: every event contributes 2^-(anchor − day), a dyadic rational;
  * re-anchoring multiplies the stored weight by 2^-Δ via `Math.scalb`
  * (an exponent shift — exact by construction, graceful underflow to 0
  * for mass older than ~1074 half-lives, which is exactly the semantics
  * a decay counter wants); and sums of dyadics at the fixture's age
  * range are exact in double. Consequences proven in DecayStreamSpec:
  * the final snapshot is BIT-EQUAL to the batch query over the same
  * feed, under any micro-batch chunking — the same associativity
  * contract as the CMS and KMV streaming states.
  *
  * This is the production freshness/popularity counter: O(1) state per
  * key, readable at any time, no re-scan of history ever.
  */
object DecayStream {

  /** w · 2^-k exactly; k ≤ 0 means same-or-newer anchor (no decay). */
  private def halve(w: Double, k: Long): Double =
    if (k <= 0L) w else Math.scalb(w, -math.min(k, 4096L).toInt)

  private def fn(eventType: String, events: Iterator[Event],
      state: GroupState[DecayState]): Iterator[DecayRow] = {
    val days = events.map(_.tsUs / EventsQueries.DayUs).toArray
    if (days.isEmpty) Iterator.empty
    else {
      val st = state.getOption.getOrElse(DecayState(0L, 0.0, 0L))
      val newDay = if (st.n == 0L) days.max else math.max(st.day, days.max)
      var w = if (st.n == 0L) 0.0 else halve(st.weight, newDay - st.day)
      var i = 0
      while (i < days.length) {
        // late events (day < anchor) fold in at their true age — the
        // update is order- and chunking-independent because every term
        // is exact
        w += halve(1.0, newDay - days(i))
        i += 1
      }
      val ns = DecayState(newDay, w, st.n + days.length)
      state.update(ns)
      Iterator.single(DecayRow(eventType, newDay, ns.n, ns.weight))
    }
  }

  def decayedPerType(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[DecayRow] = {
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(fn)
  }
}
