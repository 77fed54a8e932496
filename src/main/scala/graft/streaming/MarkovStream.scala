package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Last event seen per user: the entire Markov state — O(1) per key
  * (one timestamp, one id, one type string), bounded by #users and
  * hash-partitioned across executors at scale. */
case class MarkovState(tsUs: Long, eventId: Long, eventType: String)

/** One consumed transition: user u moved prev → next. */
case class MarkovPair(user_id: Long, prev_type: String, next_type: String)

/** Streaming twin of `events_markov_transitions`: per-user consecutive
  * event-type pairs from `flatMapGroupsWithState`, keyed by user.
  *
  * Each micro-batch's events for a user are sorted by the SAME
  * (tsUs, eventId) total order the batch window uses, chained onto the
  * state's remembered last event, and every link is emitted exactly
  * once — so over any in-order feed (chunk boundaries anywhere,
  * intra-batch arrival order arbitrary) the emitted multiset of pairs
  * equals the batch query's pair set exactly, and a trailing
  * vocabulary-sized count/normalize reproduces the transition matrix
  * bit-for-bit (MarkovStreamSpec pins both). Cross-batch regressions in
  * event time would mis-chain — the in-order-feed contract every twin
  * in this package shares.
  *
  * This is the production path for journey analytics: the raw stream
  * collapses to transition increments at the edge; nothing re-reads
  * history, and the downstream aggregation is types²-sized.
  */
object MarkovStream {

  private def fn(userId: Long, events: Iterator[Event],
      state: GroupState[MarkovState]): Iterator[MarkovPair] = {
    val batch = events.toArray.sortBy(e => (e.tsUs, e.eventId))
    if (batch.isEmpty) Iterator.empty
    else {
      var prev = state.getOption
      val out = Vector.newBuilder[MarkovPair]
      var i = 0
      while (i < batch.length) {
        val e = batch(i)
        prev.foreach(p => out += MarkovPair(userId, p.eventType, e.eventType))
        prev = Some(MarkovState(e.tsUs, e.eventId, e.eventType))
        i += 1
      }
      state.update(prev.get)
      out.result().iterator
    }
  }

  def transitions(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[MarkovPair] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(fn)
  }
}
