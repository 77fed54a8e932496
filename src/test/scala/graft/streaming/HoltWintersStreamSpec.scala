package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.{EventsQueries, SeasonalQueries}

class HoltWintersStreamSpec extends SparkSpec {

  test("batch parity: streamed fits equal the batch query bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val days = EventsQueries.events(spark, sf)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => DayCount("events", r.getLong(0), r.getLong(1)))
      .sortBy(_.day)
    val input = MemoryStream[DayCount]
    val q = HoltWintersStream.fits(input.toDS())
      .writeStream.format("memory").queryName("hw_fits")
      .outputMode("append").start()
    // batch 1 ends mid-init-buffer, batch 2 mid-series — the state must
    // carry the buffer and the recursion across both boundaries
    input.addData(days.take(10).toSeq)
    q.processAllAvailable()
    input.addData(days.slice(10, 20).toSeq)
    q.processAllAvailable()
    input.addData(days.drop(20).toSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hw_fits").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    val expected = SeasonalQueries.queries("events_holt_winters")(spark, sf)
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(5), r.getDouble(4)))
      .sortBy(_._1)
    // columns: (day, x, level, trend, fitted, seasonal-used) — note the
    // stream emits seasonal BEFORE its update, like the batch query
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1)
      assert(g._2 == e._2, s"x day ${g._1}")
      assert(g._3 == e._3, s"level day ${g._1}")
      assert(g._4 == e._4, s"trend day ${g._1}")
      assert(g._6 == e._5, s"fitted day ${g._1}")
      assert(g._5 == e._6, s"seasonal day ${g._1}")
    }
  }
}
