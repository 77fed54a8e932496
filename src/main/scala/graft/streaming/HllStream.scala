package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.hash.Fnv1a32

/** A per-type HLL register array emitted at stream close. */
case class HllOut(event_type: String, registers: Array[Int])

/** The register HyperLogLog as keyed streaming state: the live form of
  * `events_approx_users` / `events_hll_rolling`'s sketch build — 64
  * register bytes per key, so continuous distinct-user monitoring costs
  * fixed state at any ingest volume, and the current estimate is
  * readable at any time from the state alone.
  *
  * The update is per-register max, which is associative, commutative,
  * and idempotent — the final state is therefore BIT-EQUAL to the batch
  * register derivation over the same feed no matter how it was
  * micro-batched, and even under at-least-once replay (max absorbs
  * duplicates — a property the CMS counters do NOT have). Proven in
  * HllStreamSpec, which also reproduces the batch query's double
  * ESTIMATE from the streamed registers bit-for-bit.
  *
  * Rows with `userId < 0` are close sentinels, as in SketchStream.
  */
object HllStream {

  val Registers = 64 // p = 6; must match EventsQueries.hllRegisters

  /** The one update kernel — same hash/bucket/rank derivation as the
    * batch SQL (fnv1a32 low 6 bits → bucket; 27 − bitlength of the
    * remaining 26-bit window → rank). */
  def add(regs: Array[Int], key: String): Unit = {
    val h = Fnv1a32.hashString(key) // unsigned 32-bit in a long
    val bucket = (h % Registers).toInt
    val w = h / Registers
    val rank =
      if (w == 0L) 27
      else 27 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > regs(bucket)) regs(bucket) = rank
  }

  /** Registers → estimate: the identical op sequence as the batch
    * hllEstimate column derivation (exact-integer Z27, one constant
    * product, one division, linear-counting branch) — same IEEE ops on
    * the same JVM, so the double matches the query's bit-for-bit. */
  def estimate(regs: Array[Int]): Double = {
    var zp = 0L
    var present = 0
    regs.foreach { mr =>
      if (mr > 0) { zp += 1L << (27 - mr); present += 1 }
    }
    val v = Registers - present
    val z27 = zp + v.toLong * 134217728L
    val raw = 0.709 * 549755813888.0 / z27.toDouble
    if (raw <= 160.0 && v > 0) 64.0 * math.log(64.0 / v.toDouble)
    else raw
  }

  private def fn(eventType: String, events: Iterator[Event],
      state: GroupState[Array[Int]]): Iterator[HllOut] = {
    val regs = state.getOption.getOrElse(new Array[Int](Registers))
    var close = false
    events.foreach { e =>
      if (e.userId < 0) close = true
      else add(regs, e.userId.toString)
    }
    state.update(regs)
    if (close) Iterator.single(HllOut(eventType, regs.clone()))
    else Iterator.empty
  }

  def hllPerType(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[HllOut] = {
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[Array[Int], HllOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
