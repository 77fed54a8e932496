package graft.keyspace

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hash.Fnv1a32.shardId

/** Physical layout for the keyspace at scale: parquet partitioned by
  * `shard_id`, so a point GET prunes to one partition directory before a
  * single row is read — the exact analog of the coordinator routing a key
  * to one node (`cmd/coordinator/main.go:564-592`) instead of broadcasting
  * to all of them.
  *
  * `shard_id = pmod(fnv1a32(key), 4)` is computed from a literal at query
  * time; the expression is foldable, so Catalyst constant-folds it and the
  * partition filter arrives at the file index as a literal — static
  * partition pruning, no data-dependent planning needed. At 100 TB with
  * more shards (the shard count is a layout parameter, not a semantic),
  * the same layout bounds every point op to one directory's row groups.
  */
object PartitionedLayout {

  def write(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").partitionBy("shard_id").parquet(path)

  /** Point GET against the partitioned layout: shard filter (pruned at
    * planning) + key filter (pushed into the parquet reader). `numShards`
    * must match the layout's writer — it is a layout parameter, not a
    * semantic (the reference hard-codes 4, `cmd/coordinator/
    * main.go:219-232`). */
  def pointGet(spark: SparkSession, path: String, key: String,
      numShards: Int = 4): DataFrame =
    spark.read.parquet(path)
      .filter(col("shard_id") === shardId(lit(key), numShards) &&
        col("key") === key)
      .select("key", "value", "shard_id")

  /** Per-shard listing: reads exactly one partition directory. */
  def listShard(spark: SparkSession, path: String, shard: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("shard_id") === shard)
      .select("key")

  /** Route a batch of keys: derive shard, join the assignment dimension —
    * the bulk form of GetNodeForKey. */
  def route(keys: DataFrame, assignments: DataFrame): DataFrame =
    keys.withColumn("shard_id", shardId(col("key")))
      .join(broadcast(assignments), Seq("shard_id"), "left")
}
