package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.EventsQueries

class StreamJoinSpec extends SparkSpec {

  test("stream-stream interval join matches the batch join on the same events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = EventsQueries.events(spark, sf).orderBy("ts").collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val clicks = ev.filter(_.eventType == "click")
    val purchases = ev.filter(_.eventType == "purchase")

    val cIn = MemoryStream[Event]
    val pIn = MemoryStream[Event]
    val q = StreamJoin.clickToPurchase(cIn.toDS(), pIn.toDS())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    // interleave both streams across batches in TIME order — batches that
    // jump around in event time would advance the watermark past
    // not-yet-fed events and (correctly) drop them as late
    val tMin = ev.head.tsUs
    val tMax = ev.last.tsUs
    val cut1 = tMin + (tMax - tMin) / 3
    val cut2 = tMin + 2 * (tMax - tMin) / 3
    val bounds = Seq((tMin, cut1), (cut1 + 1, cut2), (cut2 + 1, tMax))
    for ((lo, hi) <- bounds) {
      cIn.addData(clicks.filter(c => c.tsUs >= lo && c.tsUs <= hi).toSeq)
      pIn.addData(purchases.filter(p => p.tsUs >= lo && p.tsUs <= hi).toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("attrib_out")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val windowUs = 30L * 60 * 1000000
    val expected = (for {
      c <- clicks
      p <- purchases
      if p.userId == c.userId && p.tsUs >= c.tsUs && p.tsUs <= c.tsUs + windowUs
    } yield (c.eventId, p.eventId)).toSet

    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("batch attribution counts exactly the stream join's matched purchases") {
    import spark.implicits._
    // the two operators state the SAME pair predicate from opposite
    // sides (purchase within 30 min after click ⟺ click within 30 min
    // before purchase) — the batch rollup's attributed count per day
    // must equal the stream join's distinct matched purchases that day
    val ev = EventsQueries.events(spark, sf).collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val clicks = ev.filter(_.eventType == "click")
    val purchases = ev.filter(_.eventType == "purchase")
    val windowUs = 30L * 60 * 1000000
    val dayUs = EventsQueries.DayUs
    val matchedByDay = (for {
      p <- purchases
      if clicks.exists(c => c.userId == p.userId &&
        p.tsUs >= c.tsUs && p.tsUs <= c.tsUs + windowUs)
    } yield p.tsUs / dayUs).groupBy(identity).view.mapValues(_.length.toLong)
    val got = EventsQueries.queries("events_attribution")(spark, sf)
      .select("day", "n_attributed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.filter(_._2 > 0) === matchedByDay.toMap)
    assert(matchedByDay.values.sum > 0, "fixture must attribute something")
  }

  test("left-outer join emits unmatched clicks with nulls after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = EventsQueries.events(spark, sf).orderBy("ts").collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val clicks = ev.filter(_.eventType == "click")
    val purchases = ev.filter(_.eventType == "purchase")

    val cIn = MemoryStream[Event]
    val pIn = MemoryStream[Event]
    val q = StreamJoin.clickToPurchaseLeftOuter(cIn.toDS(), pIn.toDS())
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    val tMin = ev.head.tsUs
    val tMax = ev.last.tsUs
    val cut = tMin + (tMax - tMin) / 2
    for ((lo, hi) <- Seq((tMin, cut), (cut + 1, tMax))) {
      cIn.addData(clicks.filter(c => c.tsUs >= lo && c.tsUs <= hi).toSeq)
      pIn.addData(purchases.filter(p => p.tsUs >= lo && p.tsUs <= hi).toSeq)
      q.processAllAvailable()
    }
    // a far-future sentinel click pushes the watermark past every real
    // click's attribution window so all pending null rows must flush
    cIn.addData(Event(-1L, tMax + 10L * 3600 * 1000000L, -1L, "click", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib_outer")
      .filter(col("click_id") =!= -1L)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val windowUs = 30L * 60 * 1000000
    val expectedPairs = (for {
      c <- clicks
      p <- purchases
      if p.userId == c.userId && p.tsUs >= c.tsUs && p.tsUs <= c.tsUs + windowUs
    } yield (c.eventId, p.eventId)).toSet
    // matched pairs identical to the inner join
    assert(rows.collect { case (c, Some(p)) => (c, p) }.toSet === expectedPairs)
    // every matchless click emits exactly one null row, none matched
    val matchedClicks = expectedPairs.map(_._1)
    val nullRows = rows.collect { case (c, None) => c }
    assert(nullRows.toSet === clicks.map(_.eventId).toSet -- matchedClicks)
    assert(nullRows.length === nullRows.distinct.length)
    assert(nullRows.nonEmpty)
  }
}
