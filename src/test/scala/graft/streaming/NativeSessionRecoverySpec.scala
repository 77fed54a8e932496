package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.events.EventsQueries

/** Checkpoint recovery for the ENGINE-OWNED session-window state:
  * StatefulRecoverySpec proves custom GroupState survives a restart;
  * this proves the built-in session_window aggregate's state store does
  * too. The event feed is cut mid-stream at a point that leaves open
  * sessions straddling the boundary, the first session is stopped, and
  * a second session resumes from the checkpoint — the straddling
  * sessions can only come out merged (one row, full span) if the open
  * window state survived. A lost store would emit the two halves as
  * separate sessions and diverge from the batch aggregate.
  */
class NativeSessionRecoverySpec extends SparkSpec {

  test("session_window state survives a mid-session restart") {
    val base = Files.createTempDirectory("graft_swin_recovery").toString
    val (inDir, outDir, ckptDir) = (s"$base/in", s"$base/out", s"$base/ckpt")
    try {
      val rows = EventsQueries.events(spark, sf)
        .orderBy("ts", "event_id").collect()
        .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4))).toSeq
      val expected = NativeSessionStream.batch(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getLong(3)))
        .toVector.sortBy(t => (t._1, t._2))

      // cut INSIDE the longest multi-event session so the restart provably
      // interrupts open window state (a mid-feed cut usually lands in the
      // silence between sessions — that would test nothing)
      val longest = expected.filter(_._4 > 0).maxBy(_._4)
      val cutTs = longest._2 + 1
      val straddling = expected.count { case (_, start, _, dur) =>
        start < cutTs && start + dur >= cutTs }
      assert(straddling > 0,
        "the cut must leave at least one session open across the restart")
      val (w1, w2) = rows.partition(_.tsUs < cutTs)
      val sentinel = Event(-1L,
        rows.map(_.tsUs).max + 100L * EventsQueries.SessionGapUs,
        -1L, "sentinel", 0.0)

      def runWave(wave: Seq[Event]): Unit = {
        val s = spark.newSession()
        import s.implicits._
        wave.toDS().repartition(1).write.mode("append").parquet(inDir)
        val src = s.readStream
          .schema("eventId BIGINT, tsUs BIGINT, userId BIGINT, " +
            "eventType STRING, value DOUBLE")
          .parquet(inDir).as[Event]
        val q = NativeSessionStream.sessions(src)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckptDir)
          .outputMode("append").start()
        q.processAllAvailable()
        q.stop()
      }
      runWave(w1)                  // session 1 dies with open windows
      runWave(w2 :+ sentinel)      // session 2 recovers + flushes all

      val got = spark.read.parquet(outDir)
        .filter("user_id >= 0").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("n_events"), r.getAs[Long]("duration_us")))
        .toVector.sortBy(t => (t._1, t._2))
      assert(got.size === expected.size,
        s"session count diverged after restart: ${got.size} vs ${expected.size}")
      assert(got === expected,
        "recovered streaming sessions must equal the batch aggregate")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
