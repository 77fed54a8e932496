package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Monoid state of the per-type rollup: count, EXACT cent sum, min/max.
  * The cent sum is the streaming form of the batch DECIMAL(18,2)
  * accumulator — a Long of cents merges associatively and never drifts,
  * where a running double would leak arrival order into the low bits. */
case class RollupState(n: Long, sumCents: Long, mn: Double, mx: Double)

/** Snapshot row — the column shape of `events_rollup_merge`. */
case class RollupSnap(event_type: String, n_events: Long,
    total_value: Double, min_value: Double, max_value: Double)

/** Structured Streaming twin of `events_rollup_merge`: the same monoid
  * partial-state merge, held as keyed GroupState instead of a stored
  * parquet table. Every micro-batch folds into the state exactly the way
  * a stored partial merges into the batch rollup, so the snapshot after
  * any prefix of the feed equals the batch query over that prefix —
  * bit-for-bit, for ANY chunking ([[RollupStreamSpec]]).
  *
  * Exactness contract: each value is converted to cents through the same
  * shortest-decimal-representation rounding Spark's double→DECIMAL(18,2)
  * cast applies (`BigDecimal.valueOf` = `Double.toString`), and the
  * snapshot divides once — so the emitted double is the batch cast's
  * double. State is 4 machine words per type, O(1) in event volume.
  */
object RollupStream {

  /** The batch `cast(value AS DECIMAL(18,2))` in streaming form. */
  def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def fn(eventType: String, events: Iterator[Event],
      state: GroupState[RollupState]): RollupSnap = {
    var st = state.getOption.getOrElse(
      RollupState(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity))
    for (e <- events)
      st = RollupState(st.n + 1, st.sumCents + cents(e.value),
        math.min(st.mn, e.value), math.max(st.mx, e.value))
    state.update(st)
    RollupSnap(eventType, st.n,
      new java.math.BigDecimal(st.sumCents).movePointLeft(2).doubleValue(),
      st.mn, st.mx)
  }

  /** events → per-type snapshot stream (Update mode: one refreshed row
    * per active type per micro-batch). */
  def rollup(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[RollupSnap] = {
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .mapGroupsWithState[RollupState, RollupSnap](
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Output mode the snapshot stream runs under. */
  val Mode: OutputMode = OutputMode.Update()
}
