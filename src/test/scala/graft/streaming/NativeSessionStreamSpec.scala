package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.EventsQueries

/** The built-in session_window aggregate under streaming must reproduce
  * the batch events_session_native result exactly once the watermark has
  * swept every session closed — same invariant the custom-state
  * SessionStream proves, now for the engine-owned merge logic. */
class NativeSessionStreamSpec extends SparkSpec {

  test("streaming session_window ≡ batch events_session_native") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = EventsQueries.events(spark, sf)
      .orderBy("ts", "event_id").collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val input = MemoryStream[Event]
    val q = NativeSessionStream.sessions(input.toDS())
      .writeStream.format("memory").queryName("native_session_out")
      .outputMode("append").start()
    for (chunk <- rows.grouped(math.max(1, rows.length / 4)))
      { input.addData(chunk.toSeq); q.processAllAvailable() }
    // far-future sentinel: watermark passes every session's close
    val maxTs = rows.map(_.tsUs).max
    input.addData(Event(-1L, maxTs + 100L * EventsQueries.SessionGapUs,
      -1L, "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("native_session_out")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = NativeSessionStream.batch(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.size === want.size,
      s"session count differs: got ${got.size}, want ${want.size}")
    assert(got === want,
      "engine-merged streaming sessions must equal the batch aggregate")
  }
}
