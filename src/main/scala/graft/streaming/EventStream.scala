package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** An event with µs event time (mirror of the batch-side derivation in
  * [[graft.events.EventsQueries.events]]). */
case class Event(eventId: Long, tsUs: Long, userId: Long, eventType: String,
    value: Double)

/** Structured Streaming twin of `events_tumbling_agg`: watermarked
  * event-time tumbling windows. In append mode a window emits exactly once,
  * when the watermark (max event time − 30 min) passes its end — late
  * events beyond the watermark are dropped, the streaming analog of the
  * batch query's closed-world grouping. State is per-(window, type) and
  * hash-partitioned across executors; at scale this is the canonical
  * shuffle-once streaming aggregation.
  */
object EventStream {

  val Watermark = "30 minutes"
  val WindowLen = "10 minutes"

  def tumblingCounts(events: Dataset[Event]): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(col("tsUs")))
      .withWatermark("event_time", Watermark)
      .groupBy(window(col("event_time"), WindowLen), col("eventType"))
      .agg(count("*").as("n"),
        // the batch twin's decimal-exact money sum — same incremental
        // exactness argument as slidingTotals
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start"),
        col("eventType").as("event_type"), col("n"), col("total_value"))

  val LateDelay = "1 hour" // = events_late_arrivals' LateDelayUs

  /** Streaming twin of `events_late_arrivals`: a watermarked streaming
    * deduplication. For the dedup operator Spark's late-row filter is on
    * the event-time COLUMN itself (not a window end), i.e. a row is
    * dropped iff its event time < (max event time of prior batches −
    * delay) — exactly the predicate the batch query evaluates per
    * replayed micro-batch. The spec reads the engine's own
    * `numRowsDroppedByWatermark` metric and matches it against the
    * batch accounting, so the batch query is proven against Spark's
    * watermark implementation, not a reimplementation of it. (The
    * event-time column joins the key list so state is evictable.) */
  def lateDedup(events: Dataset[Event]): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(col("tsUs")))
      .withWatermark("event_time", LateDelay)
      .dropDuplicates("eventId", "event_time")
      .select(col("eventId"), col("event_time"))

  val SlideWindowLen = "1 hour"
  val SlideLen = "15 minutes"

  /** Structured Streaming twin of `events_sliding_agg`: Spark's native
    * sliding `window()` assigns each event to its window/slide = 4
    * overlapping epoch-aligned windows — the same window set the batch
    * query derives by explode-by-k — and the decimal partial sums make
    * the incremental aggregation exact, so a window's emitted total is
    * bit-equal to the batch result regardless of how the feed is
    * micro-batched. State is per-window (4 live rows per slide period
    * plus the watermark lag), hash-partitioned; append mode emits each
    * window exactly once when the watermark passes its end. */
  def slidingTotals(events: Dataset[Event]): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(col("tsUs")))
      .withWatermark("event_time", Watermark)
      .groupBy(window(col("event_time"), SlideWindowLen, SlideLen))
      .agg(count("*").as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start"),
        col("n"), col("total_value"))
}
