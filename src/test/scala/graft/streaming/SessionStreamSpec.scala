package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.EventsQueries

/** The streaming sessionizer must reproduce the batch gaps-and-islands
  * sessionization exactly — for an in-order feed, and for any feed whose
  * disorder stays inside micro-batch boundaries (arrival order within a
  * batch is arbitrary; the watermark only advances between batches, so
  * nothing is late-dropped). Session numbering must be a pure function of
  * the event feed, never of how the feed was chunked into micro-batches.
  */
class SessionStreamSpec extends SparkSpec {

  private val GapHourUs = 3600L * 1000000L

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private lazy val expected: Map[(Long, Long), (Long, Long, Long)] =
    EventsQueries.queries("events_sessionize")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  /** Feed `chunks` as micro-batches, sweep timeouts with a far-future
    * sentinel, and return the emitted sessions keyed by (user, idx). */
  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Map[(Long, Long), (Long, Long, Long)] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val maxTs = rows.map(_.tsUs).max
    val input = MemoryStream[Event]
    val q = SessionStream.sessions(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    // sentinel far past every session's gap: watermark sweeps all timeouts
    input.addData(Event(-1L, maxTs + 10L * GapHourUs, -1L, "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  test("streaming sessions ≡ batch events_sessionize on the fixture") {
    val got = runStream("session_out",
      rows.grouped(math.max(1, rows.length / 5)).map(_.toSeq).toSeq)
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("session numbering is feed-deterministic across shuffled chunkings") {
    // three random replays: random micro-batch boundaries AND fully
    // shuffled arrival order within each batch. Disorder within a batch is
    // real out-of-orderness (the state fn re-sorts), and random boundaries
    // vary which sessions close in-stream vs by timeout — the marker-TTL
    // numbering must come out identical every time.
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new Random(seed)
      val cuts = (0 until 6).map(_ => rnd.nextInt(rows.length)).sorted
      val bounds = (0 +: cuts :+ rows.length).distinct
      val chunks = bounds.sliding(2).map { case Seq(a, b) =>
        rnd.shuffle(rows.slice(a, b).toSeq)
      }.filter(_.nonEmpty).toSeq
      val got = runStream(s"session_out_$seed", chunks)
      assert(got === expected,
        s"chunking seed $seed diverged: extra=${(got.toSet -- expected.toSet).take(5)} " +
          s"missing=${(expected.toSet -- got.toSet).take(5)} " +
          s"sizes got=${got.size} expected=${expected.size}")
    }
  }
}
