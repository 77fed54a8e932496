package graft.keyspace

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The per-shard Bloom gate against its contract: no false negatives
  * ever, conservation of the probe ledger, and ground-truth presence
  * tied out against an independent recount of the op log. */
class BloomGateSpec extends SparkSpec {

  test("bloom gate: no false negatives; ledger conserves; truth ties out") {
    val rows = BloomGate.queries("kv_bloom_negative")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L),
      "all four shards must see probe traffic")
    rows.foreach { case (shard, probes, present, pass, fp, short) =>
      // a Bloom filter NEVER rejects a present key, so every present
      // probe passes and the passes decompose exactly
      assert(pass == present + fp, s"shard $shard: pass != present + fp")
      assert(short == probes - pass, s"shard $shard: ledger leak")
      assert(fp >= 0 && fp <= probes - present)
    }
    // the negative-lookup population exists (GETs on tombstoned keys)
    assert(rows.map(r => r._2 - r._3).sum > 0,
      "fixture must contain absent-key reads")
    // ground truth: probe and presence totals recounted from the log
    val log = KvLog.log(spark, sf).localCheckpoint()
    val gets = log.filter(col("op") === "get")
    assert(rows.map(_._2).sum == gets.count())
    val livePresent = gets.join(
      KvLog.state(spark, sf).select("key"), Seq("key"), "leftsemi").count()
    assert(rows.map(_._3).sum == livePresent)
  }
}
