package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.events.{EventsQueries, JourneyQueries}

/** The streamed pair multiset must reproduce the batch transition
  * matrix bit-for-bit: same pair counts, and the count/normalize of the
  * emitted pairs yields the identical probability doubles. */
class MarkovStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Array[MarkovPair] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = MarkovStream.transitions(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => MarkovPair(r.getLong(0), r.getString(1), r.getString(2)))
  }

  test("streamed pairs count-normalize to the exact batch matrix") {
    val pairs = runStream("markov_one", Seq(rows.toSeq))
    val batch = JourneyQueries
      .queries("events_markov_transitions")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    val counts = pairs.groupBy(p => (p.prev_type, p.next_type)).view
      .mapValues(_.length.toLong).toMap
    assert(counts === batch.view.mapValues(_._1).toMap,
      "pair counts differ from the batch window")
    val prevTotals = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    batch.foreach { case ((a, b), (n, p)) =>
      assert(p === n.toDouble / prevTotals(a).toDouble,
        s"($a->$b): normalizing the stream does not rebuild the batch p")
    }
    // pair volume law: every user contributes (n_events - 1) links
    val perUser = rows.groupBy(_.userId).view.mapValues(_.length.toLong)
    assert(pairs.length.toLong === perUser.values.map(_ - 1L).sum)
  }

  test("chunked, intra-batch-shuffled feed emits the identical multiset") {
    val rnd = new Random(17)
    val chunks = rows.grouped(rows.length / 7 + 1)
      .map(c => rnd.shuffle(c.toSeq)).toSeq
    val a = runStream("markov_chunks", chunks)
      .map(p => (p.user_id, p.prev_type, p.next_type)).sorted
    val b = runStream("markov_again", Seq(rows.toSeq))
      .map(p => (p.user_id, p.prev_type, p.next_type)).sorted
    assert(a.toSeq === b.toSeq)
  }
}
