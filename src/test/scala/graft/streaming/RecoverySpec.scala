package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.keyspace.KvLog

/** Checkpoint recovery across a session boundary — the reference's store is
  * memory-only and loses everything on restart (`internal/shard/doc.go:321-
  * 326`); here the op-log stream restarts from its checkpoint in a SECOND
  * SparkSession and must neither duplicate nor lose a single operation.
  *
  * The restart uses `spark.newSession()` (fresh session state over the same
  * JVM context) — the recovery machinery exercised (offset log replay, file
  * source backlog listing, sink idempotence) is exactly what a new driver
  * JVM would run; the checkpoint directory is the only carried-over state.
  */
class RecoverySpec extends SparkSpec {

  private def startLogStream(session: SparkSession, inDir: String,
      logDir: String, ckptDir: String) = {
    import session.implicits._
    val ops = session.readStream
      .schema("seq BIGINT, op STRING, key STRING, value STRING")
      .parquet(inDir)
      .as[KvOp]
    KvStorage.applyStream(ops, logDir, ckptDir)
  }

  test("op-log stream resumes from checkpoint in a new session: no dup, no loss") {
    val base = Files.createTempDirectory("graft_recovery").toString
    val (inDir, logDir, ckptDir) = (s"$base/in", s"$base/log", s"$base/ckpt")
    try {
      val log = KvLog.log(spark, sf).cache()
      val total = log.count()
      val mid = log.selectExpr("percentile(seq, 0.5)").first().getDouble(0)

      // wave 1 → session 1 processes it, then the "driver" goes away
      log.filter(col("seq") <= mid).coalesce(1)
        .write.mode("append").parquet(inDir)
      val s1 = spark.newSession()
      val q1 = startLogStream(s1, inDir, logDir, ckptDir)
      q1.processAllAvailable()
      q1.stop()
      val afterWave1 = spark.read.parquet(logDir).count()
      assert(afterWave1 === log.filter(col("seq") <= mid).count())

      // wave 2 lands while no stream is running
      log.filter(col("seq") > mid).coalesce(1)
        .write.mode("append").parquet(inDir)

      // session 2: same checkpoint, fresh session — picks up ONLY wave 2
      val s2 = spark.newSession()
      val q2 = startLogStream(s2, inDir, logDir, ckptDir)
      q2.processAllAvailable()
      q2.stop()

      val persisted = spark.read.parquet(logDir)
      assert(persisted.count() === total, "an op was lost or replayed")
      assert(persisted.select("seq").distinct().count() === total,
        "duplicate ops after recovery")

      // and the recovered log compacts to exactly the batch state
      val expected = KvLog.state(spark, sf).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val got = KvStorage.currentState(spark, logDir).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got === expected)
      log.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
