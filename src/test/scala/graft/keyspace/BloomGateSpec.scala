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

  test("prefix compression: ledger equals a direct front-coding replay") {
    val rows = BloomGate.queries("kv_prefix_compress_est")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val state = KvLog.state(spark, sf)
      .select("shard_id", "key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lcp(a: String, b: String): Int = {
      var i = 0
      while (i < a.length && i < b.length && a(i) == b(i)) i += 1
      i
    }
    val expected = state.groupBy(_._1).view.mapValues { ks =>
      val sorted = ks.map(_._2).sorted
      val lcps = sorted.zipWithIndex.map { case (k, i) =>
        if (i == 0 || i % BloomGate.RestartInterval == 0) 0
        else lcp(k, sorted(i - 1))
      }
      val raw = sorted.map(_.length.toLong).sum
      val coded = sorted.zip(lcps).map { case (k, l) => k.length - l.toLong }.sum
      (sorted.length.toLong, raw, coded, lcps.count(_ == 0).toLong)
    }.toMap
    rows.foreach { case (sh, n, raw, coded, full, rate) =>
      val (en, eraw, ecoded, efull) = expected(sh)
      assert(n == en && raw == eraw && coded == ecoded && full == efull,
        s"shard $sh")
      assert(rate == (raw - coded).toDouble / raw)
      // front-coding must actually save on the order:<k> keyspace
      assert(rate > 0.3, s"shard $sh saves only $rate")
    }
  }

  test("bloom size sweep: no false negatives at any size; fp monotone") {
    val rows = BloomGate.queries("kv_bloom_size_sweep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq ==
      BloomGate.SweepMs.map(_.toLong).sorted)
    // identical probe feed at every size
    assert(rows.map(r => (r._2, r._3)).distinct.length == 1)
    rows.foreach { case (m, probes, present, fp) =>
      assert(fp >= 0 && fp <= probes - present, s"m=$m")
    }
    // bigger filters should yield fewer false positives — but only in
    // expectation: bit positions are hash % m with no subset structure
    // across sizes, so strict pairwise monotonicity is probabilistic and
    // a fixture change could flake it without any product bug. Assert the
    // robust envelope instead: the largest filter beats the smallest, and
    // no single size-up step makes things catastrophically worse.
    val fps = rows.sortBy(_._1).map(_._4)
    assert(fps.last <= fps.head,
      s"largest filter must not have more fps than smallest: $fps")
    assert(fps.zip(fps.drop(1)).forall { case (small, big) =>
      big <= small + math.max(2L, small / 4) }, s"fp jitter too large: $fps")
  }
}
