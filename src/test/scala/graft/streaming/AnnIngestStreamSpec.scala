package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.IvfPqIndex

/** The streaming ingest twin's parity contract: codes emitted for
  * arriving vectors equal the batch delta-append's rows exactly —
  * same cells, same clusters, across micro-batch boundaries. */
class AnnIngestStreamSpec extends SparkSpec {

  test("streamed ingest codes equal the batch frozen-quantizer encode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val path = IvfPqIndex.buildBaseIfMissing(spark, sf)
    val q = AnnIngestStream.loadQuantizers(spark, path)
    assert(q.cells.length > 0 && q.codebooks.length > 0)

    val cut = IvfPqIndex.baseCutoff(spark, sf)
    val arrivals = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") > cut)
      .select("vec_id", "embedding").as[VecIngest]
      .collect().sortBy(_.vec_id)
    assert(arrivals.nonEmpty)

    val input = MemoryStream[VecIngest]
    val stream = AnnIngestStream.codes(input.toDS(), q)
      .writeStream.format("memory").queryName("ingest_codes")
      .outputMode("append").start()
    // several micro-batches: statelessness means boundaries are free
    for (chunk <- arrivals.grouped(math.max(1, arrivals.length / 3))) {
      input.addData(chunk.toSeq); stream.processAllAvailable()
    }
    stream.stop()

    val got = spark.table("ingest_codes").as[IngestCode].collect()
      .map(c => (c.vec_id, c.sub, c.cluster, c.cell)).toSet
    val expected = IvfPqIndex.deltaCodes(spark, sf, path)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // shape law: every arrival contributes exactly PqM subspace rows
    assert(got.size === arrivals.length * graft.sim.SimilarityQueries.PqM)
  }
}
