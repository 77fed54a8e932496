package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.events.EventsQueries

/** The streaming rollup's final snapshot must equal the batch
  * `events_rollup_merge` rows bit-for-bit, no matter how the feed is
  * chunked into micro-batches — counts/cent-sums/min/max are monoids, so
  * chunking is associativity. */
class RollupStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private lazy val batch: Map[String, (Long, Double, Double, Double)] =
    graft.SparkEntry.queries("events_rollup_merge")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Map[String, (Long, Double, Double, Double)] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = RollupStream.rollup(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(RollupStream.Mode).start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    val out = spark.table(name).collect()
    q.stop()
    // update mode appends one refreshed row per batch — keep the LAST
    // snapshot per type (memory sink preserves arrival order)
    out.zipWithIndex
      .groupBy(_._1.getString(0))
      .map { case (t, rs) =>
        val r = rs.maxBy(_._2)._1
        t -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      }
  }

  test("one-batch feed equals the batch rollup bit-for-bit") {
    assert(runStream("rollup_one", Seq(rows.toSeq)) == batch)
  }

  test("chunking-invariant across 3 random chunkings") {
    val rnd = new Random(7)
    for (i <- 1 to 3) {
      val shuffled = rnd.shuffle(rows.toSeq)
      val chunks = shuffled.grouped(1 + rnd.nextInt(4000)).toSeq
      assert(runStream(s"rollup_c$i", chunks) == batch,
        s"chunking $i diverged")
    }
  }
}
