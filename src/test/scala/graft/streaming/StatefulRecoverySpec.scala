package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.cluster.ClusterQueries

/** Stateful (GroupState) checkpoint recovery: RecoverySpec proves offset/
  * sink exactly-once for a STATELESS stream; this proves the keyed state
  * itself survives a restart. The probe log is cut one probe BEFORE a
  * node's third consecutive failure, the first session is stopped, and a
  * second session resumes from the checkpoint — the unhealthy transition
  * can only fire with the correct seq and prev-status if the recovered
  * GroupState still holds `consecutiveFails = 2` for that node. A lost or
  * reset state store would either miss the transition or fire it later,
  * and either diverges from the batch twin.
  */
class StatefulRecoverySpec extends SparkSpec {

  test("health-monitor GroupState survives a mid-failure-run restart") {
    val base = Files.createTempDirectory("graft_state_recovery").toString
    val (inDir, outDir, ckptDir) = (s"$base/in", s"$base/out", s"$base/ckpt")
    try {
      val probes = ClusterQueries.probes(spark, sf).orderBy("seq").collect()
        .map(r => Probe(r.getString(1), r.getLong(0), r.getBoolean(2))).toSeq
      val batchExpected = ClusterQueries
        .queries("health_transitions")(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toVector.sortBy(t => (t._1, t._2))

      // cut the stream one probe before the FIRST unhealthy transition:
      // wave 1 ends with that node two failures deep
      val firstUnhealthy = batchExpected.filter(_._4 == "unhealthy")
        .map(_._2).min
      val (w1, w2) = probes.partition(_.seq < firstUnhealthy)
      assert(w1.nonEmpty && w2.nonEmpty, "the cut must split the log")

      // each wave runs in its OWN session (fresh session state; the
      // checkpoint directory is the only carried-over state), with the
      // exactly-once parquet sink
      def runWave(wave: Seq[Probe]): Unit = {
        val s = spark.newSession()
        import s.implicits._
        wave.toDS().repartition(1).write.mode("append").parquet(inDir)
        val src = s.readStream
          .schema("nodeId STRING, seq BIGINT, ok BOOLEAN")
          .parquet(inDir).as[Probe]
        val q = HealthMonitor.transitions(src)(s)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckptDir)
          .outputMode("append").start()
        q.processAllAvailable()
        q.stop()
      }
      runWave(w1) // session 1 processes up to two-failures-deep, then dies
      runWave(w2) // session 2 recovers the keyed state from the checkpoint

      // the sink's metadata log gives the exactly-once view of the output
      val got = spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[String]("nodeId"), r.getAs[Long]("seq"),
          r.getAs[String]("prevStatus"), r.getAs[String]("status")))
        .toVector.sortBy(t => (t._1, t._2))
      assert(got === batchExpected,
        s"recovered stream diverged from batch (${got.size} vs ${batchExpected.size} rows)")
      // the straddling transition itself: fired in wave 2, correct seq —
      // only possible if consecutiveFails = 2 survived the restart
      assert(got.exists(t => t._2 == firstUnhealthy && t._4 == "unhealthy"),
        s"the transition at seq $firstUnhealthy did not fire after recovery")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
