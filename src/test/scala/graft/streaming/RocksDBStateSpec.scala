package graft.streaming

import graft.SparkSpec
import graft.dedup.DedupQueries

/** The spill-capable state backend, proven on the largest keyed state in
  * the repo (the dedup band index). Every other streaming spec runs on
  * the default in-heap HDFS-backed store; at 100 TB the standing index is
  * keyed state that CANNOT live on the heap — RocksDB is Spark's
  * disk-backed store for exactly that. This spec flips
  * `spark.sql.streaming.stateStore.providerClass` to
  * RocksDBStateStoreProvider and proves the two contracts that matter:
  * batch parity (same candidates as the batch incremental stage) and
  * checkpoint recovery across a session restart — i.e. the backend swap
  * is a config change, not a semantics change. */
class RocksDBStateSpec extends SparkSpec {

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("dedup index on RocksDB state: batch parity + restart recovery") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_rocksdb_state").toString
    val (inDir, outDir, ckptDir) = (s"$base/in", s"$base/out", s"$base/ckpt")
    try {
      val sh = DedupQueries.shingled(spark, sf).localCheckpoint()
      val banded = DedupQueries.bandSignatures(sh)
      val rows = banded.collect().map(r =>
        BandKey(r.getInt(1), r.getString(2), r.getLong(0),
          r.getLong(0) % 10 == 0))
      val (probes, regs) = rows.partition(_.isProbe)

      def startProbe(session: org.apache.spark.sql.SparkSession) = {
        import session.implicits._
        session.conf.set(
          "spark.sql.streaming.stateStore.providerClass", RocksDB)
        val in = session.readStream
          .schema("band INT, sig STRING, docId BIGINT, isProbe BOOLEAN")
          .parquet(inDir).as[BandKey]
        DedupIndexStream.candidates(in)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckptDir)
          .outputMode("append").start()
      }

      // session 1 loads the standing index into RocksDB state, in several
      // micro-batch files so state accumulates, then the driver goes away
      import spark.implicits._
      spark.createDataset(regs.toSeq).coalesce(1)
        .write.mode("append").parquet(inDir)
      val s1 = spark.newSession()
      val q1 = startProbe(s1)
      q1.processAllAvailable(); q1.stop()

      // the probe batch lands while no stream runs; session 2 recovers
      // the RocksDB checkpoint — candidates exist ONLY if the bucket
      // state survived in the disk-backed store
      spark.createDataset(probes.toSeq).coalesce(1)
        .write.mode("append").parquet(inDir)
      val s2 = spark.newSession()
      val q2 = startProbe(s2)
      q2.processAllAvailable(); q2.stop()

      val got = spark.read.parquet(outDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = DedupQueries.incrementalCandidates(banded)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected,
        s"missing=${expected -- got} extra=${got -- expected}")
      assert(got.nonEmpty)

      // the run really used RocksDB: the checkpoint's state directory
      // carries RocksDB artifacts (SST/changelog zips), not the HDFS
      // store's flat .delta files
      val stateDir = new java.io.File(s"$ckptDir/state")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val names = walk(stateDir).map(_.getName)
      assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
        s"no RocksDB artifacts under $stateDir: ${names.take(20)}")
      assert(!names.exists(_.endsWith(".delta")),
        "HDFS-backed .delta files present — provider flag did not take")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
