package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.events.EventsQueries

/** Every decay-counter quantity is a dyadic rational and every update an
  * exact float op, so the streaming state must finish BIT-EQUAL to the
  * batch `events_decayed_counts` over the same feed, for any chunking.
  */
class DecayStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private lazy val batch: Map[String, (Long, Double)] =
    EventsQueries.moreQueries("events_decayed_counts")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Map[String, (Long, Long, Double)] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = DecayStream.decayedPerType(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    q.stop()
    // final snapshot per type = the row with the highest lifetime count
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (t, rs) =>
        val last = rs.maxBy(_._3)
        t -> (last._2, last._3, last._4)
      }
  }

  test("streaming decay counter finishes bit-equal to the batch query") {
    val got = runStream("decay_out",
      rows.grouped(math.max(1, rows.length / 4)).map(_.toSeq).toSeq)
    assert(got.keySet === batch.keySet)
    got.foreach { case (t, (day, n, w)) =>
      val (bn, bw) = batch(t)
      assert(n === bn, s"count drift for $t")
      assert(w === bw, s"weight drift for $t: $w vs $bw")
      assert(day === rows.map(_.tsUs / EventsQueries.DayUs).max)
    }
  }

  test("final state is chunking-invariant, including single-batch") {
    val whole = runStream("decay_whole", Seq(rows.toSeq))
    val seven = runStream("decay_seven",
      rows.grouped(math.max(1, rows.length / 7)).map(_.toSeq).toSeq)
    assert(whole === seven)
  }
}
