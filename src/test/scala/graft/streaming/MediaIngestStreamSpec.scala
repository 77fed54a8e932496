package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.multimodal.{MediaRow, Multimodal}

/** Parity between the streaming ingest validator and the batch
  * quarantine: the same corrupted feed streamed through yields exactly
  * the batch query's reject set, across micro-batch boundaries. */
class MediaIngestStreamSpec extends SparkSpec {

  test("streamed verdicts reject exactly the batch quarantine set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val feed = Multimodal.corruptedAssets(spark, sf).as[MediaRow]
      .collect().sortBy(_.doc_id)
      .map(r => MediaIngest(r.doc_id, r.media_type, r.payload))

    val input = MemoryStream[MediaIngest]
    val q = MediaIngestStream.verdicts(input.toDS())
      .writeStream.format("memory").queryName("media_verdicts")
      .outputMode("append").start()
    for (chunk <- feed.grouped(math.max(1, feed.length / 4))) {
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()

    val verdicts = spark.table("media_verdicts").as[MediaVerdict].collect()
    assert(verdicts.length === feed.length, "one verdict per asset")
    val rejected = verdicts.filter(!_.ok)
      .map(v => (v.doc_id, v.media_type, v.n_bytes)).toSet
    val batch = Multimodal.queries("media_quarantine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(rejected === batch,
      s"missing=${batch -- rejected} extra=${rejected -- batch}")
    assert(rejected.nonEmpty)
    // the pass-through side is the complement, all parseable
    assert(verdicts.count(_.ok) === feed.length - batch.size)
  }

  test("an unknown media type is validated, not waved through") {
    // mediaAssets falls back to the Y4M encoder for any type that is
    // not image/audio, so the validator must apply the Y4M parser to
    // unknown types too: garbage payload of a hypothetical fourth type
    // must land in quarantine, and a genuine Y4M container under an
    // unknown label must pass.
    val garbage = MediaIngestStream.verdict(
      MediaIngest(1L, "pointcloud", Array[Byte](1, 2, 3, 4, 5)))
    assert(!garbage.ok, "corrupt payload of an unknown type must fail")
    val real = Multimodal.encodeY4mAsset(7L, "some payload".getBytes("UTF-8"))
    assert(MediaIngestStream.verdict(
      MediaIngest(7L, "pointcloud", real)).ok,
      "a parseable fallback-encoded payload passes under an unknown label")
  }
}
