package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {

  test("duplicates are suppressed within and across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(50).collect()
      .map(r => Doc(r.getLong(0), r.getString(1)))

    val input = MemoryStream[Doc]
    val q = DedupStream.firstOccurrence(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // batch 1: first half (with an in-batch duplicate)
    input.addData(docs.take(25).toSeq :+ docs.head)
    q.processAllAvailable()
    // batch 2: second half + replays of batch 1 (cross-batch duplicates)
    input.addData(docs.drop(25).toSeq ++ docs.take(10))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").collect()
    assert(out.length === 50, s"expected 50 unique docs, got ${out.length}")
    assert(out.map(_.getLong(0)).toSet === docs.map(_.docId).toSet)
  }
}
