package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.keyspace.KvLog

class KvStreamSpec extends SparkSpec {

  test("step: LWW, stale drops, idempotent deletes, change feed") {
    import KvStream.step
    val (s1, c1) = step(None, KvOp(1, "put", "k", Some("a")))
    assert(c1.map(_.change) === Some("upserted"))
    val (s2, c2) = step(s1, KvOp(3, "put", "k", Some("b")))
    assert(c2.map(_.value) === Some(Some("b")))
    val (s3, c3) = step(s2, KvOp(2, "put", "k", Some("stale")))
    assert(c3.isEmpty && s3 === s2) // out-of-order op ignored
    val (s4, c4) = step(s3, KvOp(4, "delete", "k", None))
    assert(c4.map(_.change) === Some("deleted"))
    val (_, c5) = step(s4, KvOp(5, "delete", "k", None))
    assert(c5.isEmpty) // idempotent delete: no duplicate event
    val (_, c6) = step(None, KvOp(1, "delete", "absent", None))
    assert(c6.isEmpty) // deleting an absent key: 204, no change
  }

  test("streamed ops in shuffled order converge to the batch compaction") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ops = KvLog.log(spark, sf).collect().map { r =>
      KvOp(r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))
    }
    // deterministic shuffle: ops arrive out of seq order, across 3 batches
    val shuffled = ops.sortBy(o => graft.hash.Fnv1a32.hashString(s"${o.key}:${o.seq}"))

    val input = MemoryStream[KvOp]
    val q = KvStream.changes(input.toDS())
      .writeStream.format("memory").queryName("kv_changes")
      .outputMode("append").start()
    for (b <- shuffled.grouped(math.max(1, shuffled.length / 3)))
      { input.addData(b.toSeq); q.processAllAvailable() }
    q.stop()

    // fold the change feed to final state
    val changes = spark.table("kv_changes").as[KvChange].collect()
    val finalState = changes.groupBy(_.key).flatMap { case (k, cs) =>
      val last = cs.maxBy(_.seq)
      if (last.change == "deleted") None else Some(k -> last.value.get)
    }.toMap

    val expected = KvLog.state(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(finalState === expected)
  }
}
