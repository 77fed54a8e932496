package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.dedup.DedupQueries

class DedupIndexStreamSpec extends SparkSpec {

  test("streaming probe emits exactly the batch incremental candidates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val sh = DedupQueries.shingled(spark, sf).localCheckpoint()
    val banded = DedupQueries.bandSignatures(sh)
    val rows = banded.collect().map(r =>
      BandKey(r.getInt(1), r.getString(2), r.getLong(0),
        r.getLong(0) % 10 == 0))
    val (probes, regs) = rows.partition(_.isProbe)

    val input = MemoryStream[BandKey]
    val q = DedupIndexStream.candidates(input.toDS())
      .writeStream.format("memory").queryName("probe_out")
      .outputMode("append").start()
    // load the standing index across several micro-batches (state must
    // accumulate), then probe the new batch against the closed index
    for (chunk <- regs.grouped(math.max(1, regs.length / 3))) {
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    input.addData(probes.toSeq)
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("probe_out").as[ProbeCand]
      .collect().map(p => (p.new_doc, p.idx_doc))
    val got = emitted.toSet
    val expected = DedupQueries.incrementalCandidates(banded)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty)
    // multiplicity law: a pair is emitted once per SHARED band signature
    // (the stream is the batch candidate stage before distinct); the
    // per-micro-batch `distinct` downstream is what restores set-ness
    val bandsShared = rows.filter(_.isProbe)
      .flatMap(p => rows.collect {
        case r if !r.isProbe && r.band == p.band && r.sig == p.sig =>
          ((p.docId, r.docId), (r.band, r.sig))
      }).groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val counts = emitted.groupBy(identity).view.mapValues(_.length).toMap
    got.foreach { pair =>
      assert(counts(pair) === bandsShared(pair),
        s"$pair emitted ${counts(pair)}x, shares ${bandsShared(pair)} bands")
    }
  }

  test("index state survives a session restart: probes hit the recovered index") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_idx_recovery").toString
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
        val in = session.readStream
          .schema("band INT, sig STRING, docId BIGINT, isProbe BOOLEAN")
          .parquet(inDir).as[BandKey]
        DedupIndexStream.candidates(in)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckptDir)
          .outputMode("append").start()
      }

      // session 1 loads the standing index, then the driver goes away
      import spark.implicits._
      spark.createDataset(regs.toSeq).coalesce(1)
        .write.mode("append").parquet(inDir)
      val s1 = spark.newSession()
      val q1 = startProbe(s1)
      q1.processAllAvailable(); q1.stop()

      // the new batch lands while no stream runs; session 2 recovers the
      // checkpoint and probes — candidates exist ONLY if the bucket
      // state survived the restart
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
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("probe-only feed registers nothing; later probes still see no index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[BandKey]
    val q = DedupIndexStream.candidates(input.toDS())
      .writeStream.format("memory").queryName("probe_none")
      .outputMode("append").start()
    input.addData(Seq(BandKey(0, "s", 10L, isProbe = true)))
    q.processAllAvailable()
    // the earlier probe must not have registered doc 10
    input.addData(Seq(BandKey(0, "s", 20L, isProbe = true)))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("probe_none").count() === 0)
  }
}
