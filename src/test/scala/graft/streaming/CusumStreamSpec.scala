package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.events.{EventsQueries, TrendQueries}

/** Calibrate-then-monitor parity: a CUSUM monitor fed a reference
  * calibrated on the batch series must reproduce the batch retrospective
  * `events_cusum_shift` BIT-FOR-BIT, for any micro-batch chunking of the
  * in-order feed — the integer-numerator state makes every verdict an
  * exact function of the closed days seen, not of arrival batching. */
class CusumStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private lazy val batch: Map[(String, Long), (Long, Double, Double, Boolean)] =
    TrendQueries.queries("events_cusum_shift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(6)))
      .toMap

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Map[(String, Long), (Long, Double, Double, Boolean)] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val refs = CusumStream.calibrate(EventsQueries.events(spark, sf))
    val input = MemoryStream[Event]
    val q = CusumStream.monitor(input.toDS(), refs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    // sentinel per type on a later day closes every open day; its own
    // (sentinel) day stays open and never emits
    val maxDay = rows.map(_.tsUs / EventsQueries.DayUs).max
    val sentinels = rows.map(_.eventType).distinct.zipWithIndex.map {
      case (t, i) =>
        Event(-1L - i, (maxDay + 5) * EventsQueries.DayUs, -1L, t, 0.0)
    }
    input.addData(sentinels.toSeq)
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
  }

  test("one-batch feed reproduces the batch retrospective exactly") {
    val got = runStream("cusum_one", Seq(rows.toSeq))
    assert(got === batch)
    assert(got.exists(_._2._4), "fixture should contain at least one shift")
  }

  test("chunked feed is batching-invariant: same verdicts, any chunking") {
    val rnd = new Random(7)
    val chunks = rows.grouped(rows.length / 7 + 1)
      .map(c => rnd.shuffle(c.toSeq)).toSeq // intra-batch order arbitrary
    val got = runStream("cusum_chunks", chunks)
    assert(got === batch)
  }
}
