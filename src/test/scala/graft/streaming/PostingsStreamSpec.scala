package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.retrieval.{RetrievalQueries, SparseIndex}

class PostingsStreamSpec extends SparkSpec {

  /** The standing corpus as registration rows and the query keywords as
    * probe rows — derived from the SAME batch index tables the stream
    * must reproduce. */
  private def fixtures() = {
    val path = SparseIndex.buildIfMissing(spark, sf)
    val regs = spark.read.parquet(s"$path/postings").collect()
      .map(r => TermKey(r.getString(1), r.getLong(0), r.getLong(2),
        isProbe = false, probeId = -1L))
    // probe the served keywords of each query doc (forward-index rows
    // ranked exactly like SparseIndex.serveFrom's keyword stage)
    val fwd = spark.read.parquet(s"$path/forward")
      .filter(col("doc_id").isin(RetrievalQueries.QueryDocs: _*))
    val vstats = spark.read.parquet(s"$path/vstats")
    val c = spark.read.parquet(s"$path/cstats").head()
    val (n, _) = (c.getLong(0), c.getLong(1))
    val kw = fwd.join(vstats, "term")
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * lit(n.toDouble) /
          col("df").cast("double")).as("s"))
      .collect().groupBy(_.getLong(0)).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(r => (-r.getDouble(2), r.getString(1)))
          .take(RetrievalQueries.NumKeywords)
          .map(r => TermKey(r.getString(1), -1L, -1L,
            isProbe = true, probeId = q))
      }
    (path, regs, kw)
  }

  test("streamed probes serve exactly the batch index's pruned postings") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (path, regs, probes) = fixtures()

    val input = MemoryStream[TermKey]
    val q = PostingsStream.serve(input.toDS())
      .writeStream.format("memory").queryName("postings_out")
      .outputMode("append").start()
    // load the index across several micro-batches (state accumulates),
    // then probe against the closed index
    for (chunk <- regs.grouped(math.max(1, regs.length / 3))) {
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    input.addData(probes)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("postings_out").as[PostingHit]
      .collect().map(h => (h.probe_id, h.term, h.doc_id, h.tf)).toSet
    val terms = probes.map(t => t.probeId -> t.term)
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(terms.map(_._2).distinct: _*))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val expected = (for {
      (pid, term) <- terms
      (t, doc, tf) <- postings if t == term
    } yield (pid, term, doc, tf)).toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(got.nonEmpty)
  }

  test("index state survives a session restart: probes hit the recovered " +
      "postings") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_postings_recovery").toString
    val (inDir, outDir, ckptDir) = (s"$base/in", s"$base/out", s"$base/ckpt")
    try {
      val (path, regs, probes) = fixtures()

      def start(session: org.apache.spark.sql.SparkSession) = {
        import session.implicits._
        val in = session.readStream
          .schema("term STRING, docId BIGINT, tf BIGINT, " +
            "isProbe BOOLEAN, probeId BIGINT")
          .parquet(inDir).as[TermKey]
        PostingsStream.serve(in)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckptDir)
          .outputMode("append").start()
      }

      import spark.implicits._
      spark.createDataset(regs.toSeq).coalesce(1)
        .write.mode("append").parquet(inDir)
      val q1 = start(spark.newSession())
      q1.processAllAvailable(); q1.stop()

      spark.createDataset(probes).coalesce(1)
        .write.mode("append").parquet(inDir)
      val q2 = start(spark.newSession())
      q2.processAllAvailable(); q2.stop()

      val got = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val terms = probes.map(t => t.probeId -> t.term)
      val postings = spark.read.parquet(s"$path/postings")
        .filter(col("term").isin(terms.map(_._2).distinct: _*))
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      val expected = (for {
        (pid, term) <- terms
        (t, doc, tf) <- postings if t == term
      } yield (pid, term, doc, tf)).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("replayed registrations do not duplicate postings (last tf wins)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TermKey]
    val q = PostingsStream.serve(input.toDS())
      .writeStream.format("memory").queryName("postings_replay")
      .outputMode("append").start()
    val reg = TermKey("alpha", 5L, 3L, isProbe = false, probeId = -1L)
    input.addData(Seq(reg)); q.processAllAvailable()
    input.addData(Seq(reg)); q.processAllAvailable() // at-least-once replay
    input.addData(Seq(TermKey("alpha", 0L, 0L, isProbe = true, probeId = 9L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("postings_replay").as[PostingHit].collect().toSeq
    assert(got == Seq(PostingHit(9L, "alpha", 5L, 3L)),
      s"replay must not duplicate: $got")
  }

  test("probes see the index as of the previous batch close, and do not " +
      "register") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TermKey]
    val q = PostingsStream.serve(input.toDS())
      .writeStream.format("memory").queryName("postings_boundary")
      .outputMode("append").start()
    // registration and probe in the SAME batch: the probe sees the
    // pre-batch (empty) index
    input.addData(Seq(
      TermKey("beta", 1L, 1L, isProbe = false, probeId = -1L),
      TermKey("beta", 0L, 0L, isProbe = true, probeId = 1L)))
    q.processAllAvailable()
    assert(spark.table("postings_boundary").count() == 0)
    // next batch: the registration is now visible; the earlier probe
    // must not have registered doc 0
    input.addData(Seq(TermKey("beta", 0L, 0L, isProbe = true, probeId = 2L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("postings_boundary").as[PostingHit].collect().toSeq
    assert(got == Seq(PostingHit(2L, "beta", 1L, 1L)), got.toString)
  }
}
