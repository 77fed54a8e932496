package graft.keyspace

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32

/** Mirrors of reference test scenarios not covered elsewhere:
  * large values (`cmd/node/node_test.go:533-560` stores 10 MB;
  * `features/distributed-storage.feature:74-79` 1 MB) and the
  * special-character key matrix (`feature:106-113`,
  * `test/integration/distributed_storage_test.go:497-528`).
  */
class ReferenceScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("1 MB values survive the log -> compaction -> point-get path") {
    val big = "x" * (1024 * 1024)
    val log = Seq(
      (1L, "put", "big:1", big),
      (2L, "put", "big:1", big + "v2"), // overwrite with another large value
      (3L, "put", "small", "s")
    ).toDF("seq", "op", "key", "value")
    val state = KvLog.compact(log)
    val row = state.filter(col("key") === "big:1").collect()
    assert(row.length === 1)
    assert(row.head.getString(1).length === big.length + 2) // LWW kept v2
    assert(state.filter(col("key") === "small").count() === 1)
  }

  test("10 MB value round-trips (the node_test.go large-value case)") {
    val big = "y" * (10 * 1024 * 1024)
    val state = KvLog.compact(
      Seq((1L, "put", "huge", big)).toDF("seq", "op", "key", "value"))
    assert(state.first().getString(1).length === big.length)
  }

  test("special-character and unicode keys round-trip with stable shards") {
    val keys = Seq("simple", "user@example.com", "path/to/resource",
      "key-with-spaces here", "数字",
      "very:long:key:with:many:colons:and:segments",
      "key\twith\ttabs", "a" * 1024) // 1 KB key, integration test case
    val log = keys.zipWithIndex
      .map { case (k, i) => (i.toLong, "put", k, s"value-$i") }
      .toDF("seq", "op", "key", "value")
    val state = KvLog.compact(log)
      .withColumn("shard_id", Fnv1a32.shardId(col("key")))
    val got = state.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.keySet === keys.toSet)
    keys.zipWithIndex.foreach { case (k, i) =>
      val (v, shard) = got(k)
      assert(v === s"value-$i")
      assert(shard === Fnv1a32.hashString(k) % 4) // placement matches kernel
    }
  }
}
