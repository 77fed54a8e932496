package graft.keyspace

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32

/** The shard count is a layout parameter: the same keyspace laid out with
  * 16 shards still routes, prunes, and balances — only the modulus
  * changes. (The reference hard-codes 4; re-sharding there would be a
  * rewrite, here it is a re-partitioned write.)
  */
class ShardCountSpec extends SparkSpec {

  test("16-shard layout: uniform spread, pruned point reads") {
    val dir = Files.createTempDirectory("graft_shards16").toString
    try {
      val n = 16
      val state = KvLog.compact(KvLog.log(spark, sf))
        .select(col("key"), col("value"),
          Fnv1a32.shardId(col("key"), n).as("shard_id"))
      PartitionedLayout.write(state.coalesce(1), dir)

      // all 16 shards populated, roughly uniformly
      val counts = spark.read.parquet(dir).groupBy("shard_id").count()
        .collect().map(r => r.getLong(1))
      assert(counts.length === n)
      val (mn, mx) = (counts.min, counts.max)
      assert(mx < 2 * mn, s"skewed shards: min=$mn max=$mx")

      // point read prunes to one of sixteen directories
      val q = PartitionedLayout.pointGet(spark, dir, "order:42", n)
      val rows = q.collect()
      assert(rows.length === 1)
      // partition columns come back INT (directory values are re-inferred)
      assert(rows.head.getAs[Number]("shard_id").longValue ===
        Fnv1a32.hashString("order:42") % n)
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
      assert(scanned === 1, s"expected 1 of $n files scanned, got $scanned")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
