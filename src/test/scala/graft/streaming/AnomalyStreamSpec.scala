package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.events.EventsQueries

/** The streaming anomaly monitor must flag exactly the days a driver-side
  * trailing-statistics replay flags, regardless of how the in-order feed
  * is chunked into micro-batches (intra-batch arrival order is arbitrary —
  * the state function reduces to per-day counts before replaying).
  */
class AnomalyStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  /** Trailing-z replay over each type's ordered day counts — the monitor's
    * contract (batch events_anomaly_day judges against the FULL
    * distribution instead, so its flag set differs by design). */
  private lazy val expected: Map[(String, Long), (Long, Double)] = {
    val flags = Map.newBuilder[(String, Long), (Long, Double)]
    rows.groupBy(_.eventType).foreach { case (t, evs) =>
      val days = evs.groupBy(_.tsUs / EventsQueries.DayUs).view
        .mapValues(_.length.toLong).toSeq.sortBy(_._1)
      var (nd, s, sq) = (0L, 0L, 0L)
      days.foreach { case (day, cnt) =>
        val (n, s2, sq2) = (nd + 1, s + cnt, sq + cnt * cnt)
        if (n >= AnomalyStream.MinDays && sq2 * n > s2 * s2) {
          val z = (cnt - s2.toDouble / n) /
            math.sqrt((sq2.toDouble - s2.toDouble * s2 / n) / n)
          if (math.abs(z) >= EventsQueries.ZThreshold)
            flags += (t, day) -> (cnt, z)
        }
        nd = n; s = s2; sq = sq2
      }
    }
    flags.result()
  }

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Map[(String, Long), (Long, Double)] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = AnomalyStream.anomalies(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    // one sentinel per type, days past the feed: closes every open day
    val maxDay = rows.map(_.tsUs / EventsQueries.DayUs).max
    val sentinels = rows.map(_.eventType).distinct.zipWithIndex.map {
      case (t, i) =>
        Event(-1L - i, (maxDay + 5) * EventsQueries.DayUs, -1L, t, 0.0)
    }
    input.addData(sentinels.toSeq); q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
  }

  test("streaming anomaly flags ≡ trailing-statistics replay") {
    val got = runStream("anom_out",
      rows.grouped(math.max(1, rows.length / 5)).map(_.toSeq).toSeq)
    assert(got.nonEmpty, "the fixture's partial boundary days must flag")
    assert(got === expected)
  }

  test("a cross-batch straggler day is dropped, not folded into the open day") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val day = EventsQueries.DayUs
    def evs(d: Long, n: Int): Seq[Event] =
      (0 until n).map(i => Event(d * 1000 + i, d * day + i, 1L, "x", 0.0))
    val input = MemoryStream[Event]
    val q = AnomalyStream.anomalies(input.toDS())
      .writeStream.format("memory").queryName("anom_straggler")
      .outputMode("append").start()
    // days 0..5 at 10 events each, then a STRAGGLER for day 2 arriving
    // while day 5 is open, then an anomalous day 6
    for (d <- 0L to 5L) { input.addData(evs(d, 10)); q.processAllAvailable() }
    input.addData(evs(2L, 1)); q.processAllAvailable() // must be dropped
    input.addData(evs(6L, 100)); q.processAllAvailable()
    input.addData(Seq(Event(-1L, 10L * day, -1L, "x", 0.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("anom_straggler").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // trailing replay over the CLEAN counts — the straggler must not
    // have perturbed day 5's count or the running stats
    val counts = Seq.fill(6)(10L) :+ 100L
    var (nd, sm, sq) = (0L, 0L, 0L)
    val expected = counts.zipWithIndex.flatMap { case (cnt, d) =>
      val (n, s2, sq2) = (nd + 1, sm + cnt, sq + cnt * cnt)
      nd = n; sm = s2; sq = sq2
      if (n >= AnomalyStream.MinDays && sq2 * n > s2 * s2) {
        val z = (cnt - s2.toDouble / n) /
          math.sqrt((sq2.toDouble - s2.toDouble * s2 / n) / n)
        if (math.abs(z) >= EventsQueries.ZThreshold)
          Some((d.toLong, cnt, z)) else None
      } else None
    }.toSet
    assert(expected.nonEmpty, "day 6 must flag in the reference replay")
    assert(got === expected)
  }

  test("flag set is feed-deterministic across shuffled chunkings") {
    for (seed <- Seq(13, 37)) {
      val rnd = new Random(seed)
      val shuffledWithin = rows
        .grouped(1 + rnd.nextInt(rows.length / 3))
        .map(c => rnd.shuffle(c.toSeq)).toSeq
      val got = runStream(s"anom_out_$seed", shuffledWithin)
      assert(got === expected, s"seed $seed diverged")
    }
  }
}
