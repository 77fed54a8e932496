package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.EventsQueries

/** The streaming sessionizer must reproduce the batch gaps-and-islands
  * sessionization exactly for an in-order feed: every session closed either
  * by a later event past the gap or by the event-time timeout at
  * end-of-stream.
  */
class SessionStreamSpec extends SparkSpec {

  test("streaming sessions ≡ batch events_sessionize on the fixture") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val rows = EventsQueries.events(spark, sf)
      .orderBy("ts", "event_id").collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val maxTs = rows.map(_.tsUs).max

    val input = MemoryStream[Event]
    val q = SessionStream.sessions(input.toDS())
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    for (chunk <- rows.grouped(math.max(1, rows.length / 5)))
      { input.addData(chunk.toSeq); q.processAllAvailable() }
    // sentinel far past every session's gap: watermark sweeps all timeouts
    input.addData(Event(-1L, maxTs + 10L * GapHourUs, -1L, "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("session_out")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val expected = EventsQueries.queries("events_sessionize")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size === expected.size)
    assert(got === expected)
  }

  private val GapHourUs = 3600L * 1000000L
}
