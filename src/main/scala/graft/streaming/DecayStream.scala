package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.EventsQueries

/** Decay-counter state: per-day event counts inside the horizon, keyed
  * by absolute day. ≤ MaxDecayAge+1 entries per key, forever — the
  * horizon that defines the operator is also what bounds the state. */
case class DecayState(counts: Map[Long, Long])

/** Per-type decayed-count snapshot emitted each micro-batch. `day` is
  * the KEY's own anchor (its newest day seen). */
case class DecayRow(event_type: String, day: Long, n_events: Long,
    decayed_weight: Double)

/** Streaming twin of `events_decayed_counts`: a keyed exponential-decay
  * counter (1-day half-life, [[EventsQueries.MaxDecayAge]]-day horizon)
  * in `flatMapGroupsWithState`.
  *
  * The state is NOT a decayed float — it is the per-day integer counts
  * inside the horizon (exact, order- and chunking-independent by
  * counter associativity). Each snapshot derives the weight by the SAME
  * fixed ascending-age left fold the batch query and its DuckDB oracle
  * run, so the emitted double is bit-equal to the batch query over the
  * same feed whenever the key's anchor coincides with the corpus
  * anchor (a key active on the newest day). One contract difference is
  * deliberate and documented: each key's ages are measured from its OWN
  * newest day (streaming state cannot see other keys), where the batch
  * query anchors every type to the corpus-wide newest day. A reader
  * re-derives batch semantics from (day, counts) exactly; the spec pins
  * both cases — bit-equality on anchor-aligned feeds AND the per-key
  * anchor on a feed where a type goes quiet before the corpus ends.
  *
  * This is the production freshness/popularity counter: O(horizon)
  * state per key, readable any time, no history re-scan ever.
  */
object DecayStream {

  val MaxAge: Long = EventsQueries.MaxDecayAge

  /** The ONE weight fold — ascending age, cnt/2^age in double — shared
    * (by op sequence) with the batch aggregate and the oracle. */
  def weightOf(counts: Map[Long, Long], anchor: Long): Double =
    counts.toSeq.map { case (d, c) => (anchor - d, c) }
      .sortBy(_._1)
      .foldLeft(0.0) { case (acc, (age, c)) =>
        acc + c.toDouble / (1L << age).toDouble
      }

  private def fn(eventType: String, events: Iterator[Event],
      state: GroupState[DecayState]): Iterator[DecayRow] = {
    val days = events.map(_.tsUs / EventsQueries.DayUs).toArray
    if (days.isEmpty) Iterator.empty
    else {
      val prev = state.getOption.map(_.counts).getOrElse(Map.empty)
      var counts = prev
      var i = 0
      while (i < days.length) {
        counts = counts.updated(days(i), counts.getOrElse(days(i), 0L) + 1L)
        i += 1
      }
      val anchor = counts.keys.max
      // horizon prune: mass below 2^-MaxAge leaves the operator (and
      // the state) — late events older than the horizon never enter
      counts = counts.filter { case (d, _) => anchor - d <= MaxAge }
      state.update(DecayState(counts))
      Iterator.single(DecayRow(eventType, anchor, counts.values.sum,
        weightOf(counts, anchor)))
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
