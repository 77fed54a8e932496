package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.{EventsQueries, SeasonalQueries}

/** Checkpoint recovery for the Holt–Winters keyed state: the stream is
  * killed INSIDE the init buffer (day 10 of 14) — the phase where a
  * lost state store silently re-initializes from a truncated window and
  * produces plausible-but-wrong levels forever after — and a second
  * session resumes from the checkpoint. Bit-equality with the batch
  * query across the restart proves both the buffered init window and
  * the live (l, b, s) recursion survived. */
class HoltWintersRecoverySpec extends SparkSpec {

  test("holt-winters state survives a mid-init-buffer restart") {
    val base = Files.createTempDirectory("graft_hw_recovery").toString
    val (inDir, outDir, ckptDir) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val days = EventsQueries.events(spark, sf)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => DayCount("events", r.getLong(0), r.getLong(1)))
      .sortBy(_.day)
    // cut mid-buffer: 10 of the 14 init days in wave 1
    val (w1, w2) = days.splitAt(10)
    def runWave(wave: Seq[DayCount]): Unit = {
      val s = spark.newSession()
      import s.implicits._
      wave.toDS().repartition(1).write.mode("append").parquet(inDir)
      val src = s.readStream
        .schema("series STRING, day BIGINT, n BIGINT")
        .parquet(inDir).as[DayCount]
      val q = HoltWintersStream.fits(src)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    runWave(w1.toSeq) // dies with 10 days buffered, nothing emitted yet
    runWave(w2.toSeq) // must recover the buffer to initialize correctly
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
      .sortBy(_._1)
    val expected = SeasonalQueries.queries("events_holt_winters")(spark, sf)
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == expected.length,
      s"row count across restart: ${got.length} vs ${expected.length}")
    got.zip(expected).foreach { case ((gd, gl), (ed, el)) =>
      assert(gd == ed)
      assert(gl == el, s"level at day $gd diverged after recovery")
    }
  }
}
