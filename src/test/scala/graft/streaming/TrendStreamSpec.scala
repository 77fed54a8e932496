package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.events.{EventsQueries, TrendQueries}

/** The live trend monitor's FINAL fit per type must equal the batch
  * `events_trend_forecast` row bit-for-bit (same exact integer moments,
  * same double expression order), for any chunking of the in-order feed;
  * earlier emissions are the prefix fits, one per closed day. */
class TrendStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Array[TrendOut] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = TrendStream.fits(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    val maxDay = rows.map(_.tsUs / EventsQueries.DayUs).max
    val sentinels = rows.map(_.eventType).distinct.zipWithIndex.map {
      case (t, i) =>
        Event(-1L - i, (maxDay + 5) * EventsQueries.DayUs, -1L, t, 0.0)
    }
    input.addData(sentinels.toSeq)
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect().map(r => TrendOut(r.getString(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)))
  }

  test("final emission equals the batch fit exactly; prefix fits complete") {
    val got = runStream("trend_one", Seq(rows.toSeq))
    val finals = got.groupBy(_.event_type).view
      .mapValues(_.maxBy(_.day)).toMap
    val batch = TrendQueries.queries("events_trend_forecast")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    assert(batch.nonEmpty && finals.keySet == batch.keySet)
    batch.foreach { case (t, (nd, slope, intercept, fc)) =>
      val f = finals(t)
      assert(f.n_days == nd, t)
      assert(f.slope == slope, s"$t slope")
      assert(f.intercept == intercept, s"$t intercept")
      assert(f.forecast_next == fc, s"$t forecast")
    }
    // one emission per closed day from MinDays on
    got.groupBy(_.event_type).foreach { case (t, es) =>
      val days = es.map(_.day).sorted
      assert(days.distinct.length == days.length, s"$t duplicate emissions")
      assert(es.map(_.n_days).sorted.toSeq ==
        (TrendStream.MinDays.toLong to es.length + 1).toSeq, t)
    }
  }

  test("chunked, intra-batch-shuffled feed emits the identical fit set") {
    val rnd = new Random(13)
    val chunks = rows.grouped(rows.length / 9 + 1)
      .map(c => rnd.shuffle(c.toSeq)).toSeq
    val a = runStream("trend_chunks", chunks).sortBy(o => (o.event_type, o.day))
    val b = runStream("trend_again", Seq(rows.toSeq))
      .sortBy(o => (o.event_type, o.day))
    assert(a.toSeq == b.toSeq)
  }
}
