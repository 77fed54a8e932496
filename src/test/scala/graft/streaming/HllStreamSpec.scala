package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.EventsQueries

/** Register max-merge is associative, commutative, AND idempotent, so the
  * streaming HLL state must finish bit-equal to the batch register
  * derivation for any chunking, any order — and even under duplicated
  * delivery (the at-least-once property the CMS counters lack). The
  * estimate derived from the streamed registers must equal the batch
  * query's double bit-for-bit.
  */
class HllStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  /** Batch registers per type as a dense 64-int array. */
  private lazy val batchRegs: Map[String, Seq[Int]] =
    EventsQueries.hllRegisters(
        EventsQueries.events(spark, sf), Seq("event_type"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1).toInt, r.getInt(2)))
      .groupBy(_._1)
      .map { case (t, rs) =>
        val regs = new Array[Int](HllStream.Registers)
        rs.foreach { case (_, b, mr) => regs(b) = mr }
        t -> regs.toSeq
      }

  private lazy val batchEstimates: Map[String, Double] =
    EventsQueries.queries("events_approx_users")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Map[String, Seq[Int]] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = HllStream.hllPerType(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    val sentinels = rows.map(_.eventType).distinct.zipWithIndex.map {
      case (t, i) => Event(-1L - i, 0L, -1L, t, 0.0)
    }
    input.addData(sentinels.toSeq); q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
  }

  test("streaming HLL registers finish bit-equal to the batch derivation") {
    val got = runStream("hll_out",
      rows.grouped(math.max(1, rows.length / 4)).map(_.toSeq).toSeq)
    assert(got.keySet === batchRegs.keySet)
    got.foreach { case (t, regs) =>
      assert(regs === batchRegs(t), s"registers diverged for $t")
      // and the estimate derived from the streamed state reproduces the
      // batch query's double bit-for-bit
      assert(HllStream.estimate(regs.toArray) === batchEstimates(t),
        s"estimate diverged for $t")
    }
  }

  test("final registers are chunking-, order-, and duplicate-invariant") {
    val rnd = new Random(7)
    val shuffled = rnd.shuffle(rows.toSeq)
    // duplicate a random 10% of the feed: at-least-once delivery
    val dupes = rnd.shuffle(rows.toSeq).take(rows.length / 10)
    val feed = rnd.shuffle(shuffled ++ dupes)
    val got = runStream("hll_out_dup",
      feed.grouped(math.max(1, feed.length / 7)).map(_.toSeq).toSeq)
    assert(got === batchRegs)
  }
}
