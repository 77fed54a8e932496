package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.{EventsQueries, LifecycleQueries}

class WindowDedupStreamSpec extends SparkSpec {

  private val W = LifecycleQueries.DedupWindowUs

  test("lag semantics: a tight burst is suppressed whole (not debounced)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // one key, events at 0, 5min, 11min, 30min: the 11min event is 11min
    // past the first KEPT event but only 6min past its predecessor — the
    // lag rule drops it; a debounce-to-first rule would re-admit it
    val evs = Seq(
      RawEvent(1L, 0L, 7L, "click"),
      RawEvent(2L, 5L * 60 * 1000000L, 7L, "click"),
      RawEvent(3L, 11L * 60 * 1000000L, 7L, "click"),
      RawEvent(4L, 30L * 60 * 1000000L, 7L, "click"))
    val input = MemoryStream[RawEvent]
    val q = WindowDedupStream.dedup(input.toDS())
      .writeStream.format("memory").queryName("wd_burst")
      .outputMode("append").start()
    input.addData(evs.take(2)) // boundary splits the chain mid-burst
    q.processAllAvailable()
    input.addData(evs.drop(2))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("wd_burst").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("batch parity: stream output equals the lag-window filter") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = EventsQueries.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
      .collect()
      .map(r => RawEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .sortBy(e => (e.ts, e.eventId)) // source contract: time-ordered feed
    val input = MemoryStream[RawEvent]
    val q = WindowDedupStream.dedup(input.toDS())
      .writeStream.format("memory").queryName("wd_parity")
      .outputMode("append").start()
    val (b1, b2) = evs.splitAt(evs.length / 2)
    input.addData(b1.toSeq)
    q.processAllAvailable()
    input.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wd_parity").collect().map(_.getLong(0)).toSet
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    val expected = EventsQueries.events(spark, sf)
      .withColumn("gap", col("ts") - lag("ts", 1).over(w))
      .filter(col("gap").isNull || col("gap") > W)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // and the kept census agrees with the batch query's ledger
    val ledger = LifecycleQueries.queries("events_window_dedup")(spark, sf)
      .agg(sum("n_kept")).collect().head.getLong(0)
    assert(got.size.toLong == ledger)
  }
}
