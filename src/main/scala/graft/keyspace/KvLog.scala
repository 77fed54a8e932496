package graft.keyspace

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hash.Fnv1a32.shardId

/** The keyspace fixture: an append-only operation log and its last-write-wins
  * compaction into current state.
  *
  * The reference engine's only "write path" is upsert-or-tombstone into a
  * mutable map (`Put` overwrites without warning, `internal/storage/
  * store.go:348-358`; `Delete` is idempotent, `store.go:391-397`). Spark data
  * is immutable, so mutation is modeled the way a log-structured store would:
  * an op log `(seq, op, key, value)` compacted by keeping the highest-`seq`
  * op per key and dropping keys whose final op is a delete.
  *
  * Scale notes (100 TB): compaction is a `groupBy(key).agg(max_by(...))` —
  * a hash aggregate with map-side partial aggregation, NOT a
  * `row_number()` window (which would shuffle and sort the full log).
  * Partial aggregation collapses each key to one row per map task before the
  * shuffle, so shuffle volume is bounded by distinct keys, not log length.
  */
object KvLog {

  /** Deterministic op log derived from `orders` (see FIXTURES.md §1 and
    * [[graft.oracle.Ora.kvLog]] — the DuckDB mirror; keep in lockstep).
    */
  def log(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val key = concat(lit("order:"), col("o_orderkey").cast("string"))

    // one scan, not five: a union of filtered selects would read the
    // orders file once per branch; instead each order row explodes into
    // its 1–5 log ops (base put, conditional update, conditional
    // empty-value put, conditional tombstone, conditional get) from a
    // single pass
    def op(seq: Column, opName: String, value: Column) =
      struct(seq.as("seq"), lit(opName).as("op"), key.as("key"),
        value.as("value"))
    val emptyOps = array().cast(
      "array<struct<seq:bigint,op:string,key:string,value:string>>")

    orders.select(explode(concat(
        array(op(col("o_orderkey") * 8, "put",
          concat_ws(":", col("o_orderstatus"), col("o_orderpriority"),
            col("o_custkey").cast("string")))),
        when(col("o_orderkey") % 97 === 0,
          array(op(col("o_orderkey") * 8 + 1, "put",
            concat(lit("updated:"), col("o_custkey").cast("string")))))
          .otherwise(emptyOps),
        // empty-value PUT: legal in the reference (`store.go:84`, tested at
        // `cmd/node/node_test.go`) — an empty string is a real value, NOT a
        // tombstone; it must survive LWW compaction and count 0 bytes.
        when(col("o_orderkey") % 103 === 0,
          array(op(col("o_orderkey") * 8 + 2, "put", lit(""))))
          .otherwise(emptyOps),
        when(col("o_orderkey") % 101 === 0,
          array(op(col("o_orderkey") * 8 + 4, "delete",
            lit(null).cast("string"))))
          .otherwise(emptyOps),
        // read traffic: Gets are counted in the reference's OperationStats
        // (internal/shard/shard.go:124-161, increment at shard.go:258) but
        // never touch state — compact() ignores them. The %25/%125
        // branches skew the read distribution (1/2/3 gets per key) so
        // read-hotness is a real signal, as production key traffic is.
        when(col("o_orderkey") % 5 === 0,
          array(op(col("o_orderkey") * 8 + 6, "get",
            lit(null).cast("string"))))
          .otherwise(emptyOps),
        when(col("o_orderkey") % 25 === 0,
          array(op(col("o_orderkey") * 8 + 7, "get",
            lit(null).cast("string"))))
          .otherwise(emptyOps),
        when(col("o_orderkey") % 125 === 0,
          array(op(col("o_orderkey") * 8 + 3, "get",
            lit(null).cast("string"))))
          .otherwise(emptyOps))).as("r"))
      .select(col("r.seq").as("seq"), col("r.op").as("op"),
        col("r.key").as("key"), col("r.value").as("value"))
  }

  /** LWW compaction of any `(seq, op, key, value)` log → current state
    * `(key, value)`: keep the highest-seq WRITE op per key, drop final
    * deletes. Reads (`get`) are op-counter traffic only — they never
    * mutate state, exactly as in the reference store. */
  def compact(log: DataFrame): DataFrame =
    log.filter(col("op").isin("put", "delete"))
      .groupBy("key")
      .agg(max_by(col("value"), col("seq")).as("value"),
           max_by(col("op"), col("seq")).as("op"))
      .filter(col("op") === "put")
      .select(col("key"), col("value"))

  /** LWW compaction → current keyspace `(key, value, shard_id)`.
    *
    * `shard_id = fnv1a32(key) % 4` reproduces the coordinator's routing
    * (`shard_registry.go:372-379`); at scale this column doubles as the
    * physical partitioning key (`repartition(4, $"shard_id")` or parquet
    * `partitionBy("shard_id")`) so point lookups prune to one partition the
    * way the coordinator prunes to one node.
    */
  def state(spark: SparkSession, sfDir: String): DataFrame =
    compact(log(spark, sfDir))
      .select(col("key"), col("value"), shardId(col("key")).as("shard_id"))

  /** Incremental (base + delta) compaction — the shape a log-structured
    * store actually runs at 100 TB. A full recompaction rescans the entire
    * history every time; here the log is split at `t = max(seq) div 2`
    * into an already-compacted base snapshot (one row per live key,
    * carrying its last write seq) and a small delta tail, and only
    * base ∪ delta is LWW-merged. Tombstone algebra holds across the seam:
    * a key whose final pre-`t` op is a delete is simply absent from the
    * complete-prefix base (no tombstone carry needed), a delta delete
    * out-ranks any base seq, and a delta put resurrects a base-deleted
    * key. [[graft.keyspace.CompactionLawSpec]] asserts the merged state is
    * row-identical to the full recompaction.
    *
    * Returns `(key, value, shard_id, from_delta)` where `from_delta`
    * marks keys whose winning write arrived after the split.
    */
  def incrementalState(spark: SparkSession, sfDir: String): DataFrame = {
    val writes = log(spark, sfDir).filter(col("op").isin("put", "delete"))
    val split = writes.agg(expr("max(seq) div 2").as("t"))
    val w = writes.crossJoin(broadcast(split))
    val base = w.filter(col("seq") <= col("t"))
      .groupBy("key")
      .agg(max_by(col("value"), col("seq")).as("value"),
        max_by(col("op"), col("seq")).as("op"),
        max(col("seq")).as("seq"))
      .filter(col("op") === "put")
      .select(col("seq"), lit("put").as("op"), col("key"), col("value"))
    val delta = w.filter(col("seq") > col("t"))
      .select("seq", "op", "key", "value")
    compact(base.unionByName(delta))
      .join(delta.select(col("key")).distinct()
        .withColumn("from_delta", lit(true)), Seq("key"), "left")
      .select(col("key"), col("value"), shardId(col("key")).as("shard_id"),
        coalesce(col("from_delta"), lit(false)).as("from_delta"))
  }
}
