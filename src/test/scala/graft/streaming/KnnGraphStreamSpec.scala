package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.SimilarityQueries

class KnnGraphStreamSpec extends SparkSpec {

  /** All corpus vectors as arrivals, bucketed by the batch hyperplanes. */
  private def arrivals() =
    SimilarityQueries.pairMembers(spark, sf)
      .select("bucket", "vec_id", "label", "embedding")
      .collect()
      .map(r => VecArrival(r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getSeq[Float](3).toArray))

  /** "Latest generation per bucket, alive rows only" — the serving view. */
  private def latestAlive(rows: Seq[BucketPairEmit]): Set[(Long, Long, Long, Long, Long, Double)] = {
    val maxGen = rows.groupBy(_.bucket).view.mapValues(_.map(_.gen).max)
    rows.filter(r => r.gen == maxGen(r.bucket) && r.alive)
      .map(r => (r.bucket, r.vec_id, r.label, r.nbr, r.nbr_label, r.cos_sim))
      .toSet
  }

  private def batchPairs(): Set[(Long, Long, Long, Long, Long, Double)] =
    SimilarityQueries
      .pairsFrom(SimilarityQueries.pairMembers(spark, sf).localCheckpoint())
      .select("bucket", "vec_id", "label", "nbr", "nbr_label", "cos_sim")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSet

  test("latest-gen view equals the batch pair set bit-for-bit across " +
      "multi-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vecs = arrivals()
    val input = MemoryStream[VecArrival]
    val q = KnnGraphStream.bucketGenerations(input.toDS())
      .writeStream.format("memory").queryName("knng_out")
      .outputMode("append").start()
    // three arrival waves: touched buckets recompute per wave, untouched
    // generations stand — the incremental contract under test
    for (chunk <- vecs.grouped(math.max(1, vecs.length / 3))) {
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()
    val emitted = spark.table("knng_out").as[BucketPairEmit].collect().toSeq
    val got = latestAlive(emitted)
    val expected = batchPairs()
    assert(got === expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty)
    // replay absorption: re-sending every arrival must not change the view
    // (vecId dedup in state), only bump generations
  }

  test("cap flip tombstones the bucket: over-cap recompute supersedes " +
      "the previous generation's pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def vec(id: Long) = VecArrival(7L, id, id % 2,
      Array(1.0f, id.toFloat, 0.5f))
    val input = MemoryStream[VecArrival]
    val q = KnnGraphStream.bucketGenerations(input.toDS(), cap = 4)
      .writeStream.format("memory").queryName("knng_flip")
      .outputMode("append").start()
    input.addData(Seq(vec(1), vec(2), vec(3), vec(4))) // at cap: 12 pairs
    q.processAllAvailable()
    val g1 = spark.table("knng_flip").as[BucketPairEmit].collect().toSeq
    assert(latestAlive(g1).size === 12)
    input.addData(Seq(vec(5))) // pushes past cap — batch rule: zero pairs
    q.processAllAvailable()
    q.stop()
    val g2 = spark.table("knng_flip").as[BucketPairEmit].collect().toSeq
    assert(latestAlive(g2).isEmpty,
      "over-cap bucket must serve zero pairs after the flip")
    // the tombstone is what superseded gen 1 — it must exist and be max-gen
    val tomb = g2.filter(r => !r.alive)
    assert(tomb.nonEmpty && tomb.map(_.gen).max === g2.map(_.gen).max)
  }

  test("replayed arrivals are absorbed: the serving view is unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vecs = arrivals().take(40)
    val input = MemoryStream[VecArrival]
    val q = KnnGraphStream.bucketGenerations(input.toDS())
      .writeStream.format("memory").queryName("knng_replay")
      .outputMode("append").start()
    input.addData(vecs.toSeq); q.processAllAvailable()
    val beforeRows = spark.table("knng_replay").as[BucketPairEmit]
      .collect().toSeq
    val before = latestAlive(beforeRows)
    input.addData(vecs.toSeq); q.processAllAvailable() // at-least-once replay
    q.stop()
    val afterRows = spark.table("knng_replay").as[BucketPairEmit]
      .collect().toSeq
    assert(latestAlive(afterRows) === before)
    // a replay-only micro-batch must be SILENT: no generation bump, no
    // re-emission of the buckets' O(members²) pair sets — the standing
    // generations already reflect the membership
    assert(afterRows.size === beforeRows.size,
      s"replay re-emitted ${afterRows.size - beforeRows.size} rows")
  }

  test("bucket state survives a session restart (kill-and-recover)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_knng_recovery").toString
    val (inDir, outDir, ckptDir) = (s"$base/in", s"$base/out", s"$base/ckpt")
    try {
      import spark.implicits._
      val vecs = arrivals()
      val (wave1, wave2) = vecs.splitAt(vecs.length / 2)

      def start(session: org.apache.spark.sql.SparkSession) = {
        import session.implicits._
        val in = session.readStream
          .schema("bucket BIGINT, vecId BIGINT, label BIGINT, " +
            "embedding ARRAY<FLOAT>")
          .parquet(inDir).as[VecArrival]
        KnnGraphStream.bucketGenerations(in)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckptDir)
          .outputMode("append").start()
      }

      spark.createDataset(wave1.toSeq).coalesce(1)
        .write.mode("append").parquet(inDir)
      val q1 = start(spark.newSession())
      q1.processAllAvailable(); q1.stop()

      // second wave lands while no stream runs; the recovered session's
      // recomputes are only exact if bucket membership survived
      spark.createDataset(wave2.toSeq).coalesce(1)
        .write.mode("append").parquet(inDir)
      val q2 = start(spark.newSession())
      q2.processAllAvailable(); q2.stop()

      val emitted = spark.read.parquet(outDir).as[BucketPairEmit]
        .collect().toSeq
      assert(latestAlive(emitted) === batchPairs())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
