package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream interval join: each click joined to the same user's
  * purchases within the following 30 minutes — attribution, the canonical
  * two-stream use case.
  *
  * Both sides carry watermarks so Spark can bound the buffered state: a
  * click older than (watermark − 30 min) can never match a future purchase
  * and its state is dropped; same for purchases. Without the time bound
  * and watermarks, a stream-stream join would buffer both streams forever.
  * State is hash-partitioned by the join key, scaling like any keyed
  * streaming operator.
  */
object StreamJoin {

  val AttributionWindow = "30 minutes"
  val Watermark = "1 hour"

  def clickToPurchase(clicks: Dataset[Event],
      purchases: Dataset[Event]): DataFrame =
    joined(clicks, purchases, "inner")

  /** Left-outer variant: every click emits — matched rows as they pair,
    * UNMATCHED clicks with null purchase columns once the watermark
    * passes their attribution window (only then can "no purchase will
    * ever come" be decided, so the null rows trail by exactly the state
    * bound — the semantics that make a streaming outer join different
    * from a batch one). Conversion/abandonment funnels read this shape
    * directly; state bounds identical to the inner form. */
  def clickToPurchaseLeftOuter(clicks: Dataset[Event],
      purchases: Dataset[Event]): DataFrame =
    joined(clicks, purchases, "left_outer")

  private def joined(clicks: Dataset[Event], purchases: Dataset[Event],
      joinType: String): DataFrame = {
    val c = clicks
      .select(col("eventId").as("click_id"), col("userId").as("c_user"),
        timestamp_micros(col("tsUs")).as("c_time"))
      .withWatermark("c_time", Watermark)
    val p = purchases
      .select(col("eventId").as("purchase_id"), col("userId").as("p_user"),
        timestamp_micros(col("tsUs")).as("p_time"))
      .withWatermark("p_time", Watermark)
    c.join(p,
      expr(s"""c_user = p_user AND
               p_time >= c_time AND
               p_time <= c_time + interval $AttributionWindow"""),
      joinType)
      .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"),
        unix_micros(col("c_time")).as("click_us"),
        unix_micros(col("p_time")).as("purchase_us"))
  }
}
