package graft.cluster

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.keyspace.KvLog

class RingRouterSpec extends SparkSpec {
  import RingRouter._

  test("ring positions are collision-free and pos32 matches posOf") {
    val r = ring(RingNodes :+ JoinedNode)
    assert(r.size == 5 * VNodes)
    assert(r.map(_._1).distinct.size == r.size)
    assert(r == r.sortBy(_._1))
    // column expression ≡ driver-side twin on vnode names and real keys
    import spark.implicits._
    val names = r.indices.map(i => s"n${i % 5 + 1}#${i / 5}") ++
      Seq("order:1", "order:999", "", "a")
    val got = names.toDF("s").select(col("s"), pos32(col("s")).as("p"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    for (n <- names) assert(got(n) == posOf(n), s"pos mismatch for '$n'")
  }

  test("successor scan matches a binary-search reimplementation") {
    val nodes = RingNodes
    val r = ring(nodes)
    val ps = r.map(_._1).toArray
    def bruteAssign(key: String): String = {
      val kp = posOf(key)
      var lo = 0; var hi = ps.length
      while (lo < hi) { // first index with ps(idx) >= kp
        val mid = (lo + hi) / 2
        if (ps(mid) >= kp) hi = mid else lo = mid + 1
      }
      r(lo % ps.length)._2
    }
    val sample = KvLog.state(spark, sf)
      .select(col("key"), ringNodeCol(nodes)(col("key")).as("node_id"))
      .limit(300).collect()
    assert(sample.nonEmpty)
    for (row <- sample)
      assert(row.getString(1) == bruteAssign(row.getString(0)),
        s"ring assignment diverged for key ${row.getString(0)}")
  }

  test("ring balances load and moves far fewer keys than mod on node join") {
    val keys = queries("route_ring_keys")(spark, sf).collect()
    assert(keys.map(_.getString(0)).toSeq == RingNodes)
    val counts = keys.map(_.getLong(1))
    assert(counts.max.toDouble / counts.min < 2.5,
      s"64-vnode ring should spread load: ${counts.toSeq}")
    val reb = queries("route_ring_rebalance")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(reb("ring") > 0.0 && reb("ring") < 0.35,
      s"ring move frac ${reb("ring")} should sit near 1/(n+1)=0.2")
    assert(reb("mod") > 0.6,
      s"mod move frac ${reb("mod")} should sit near n/(n+1)=0.8")
    assert(reb("ring") < reb("mod") / 2)
  }

  test("assignment is a pure projection: one exchange total (the count agg)") {
    val df = queries("route_ring_keys")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan
    val n = finalPlan.collect { case s: ShuffleExchangeLike => s }.size
    assert(n <= 2, // partial agg + window over #nodes rows; no join exchange
      s"expected no per-key shuffle beyond the count agg, got $n exchanges:\n" +
        finalPlan.toString.take(2000))
  }

  test("preference lists: R distinct nodes, primary = successor, laws hold") {
    val sets = RingRouter.replicaSets(RingRouter.RingNodes, RingRouter.ReplicaN)
    assert(sets.size === RingRouter.RingNodes.size * RingRouter.VNodes)
    sets.foreach { s =>
      assert(s.size === RingRouter.ReplicaN)
      assert(s.distinct.size === s.size, "replicas must be distinct nodes")
    }
    // slot i's primary is slot i's owner
    val rg = RingRouter.ring(RingRouter.RingNodes)
    sets.zip(rg).foreach { case (s, (_, owner)) => assert(s.head === owner) }

    // the query's role-1 load equals the primary routing census, and each
    // role layer carries every key exactly once
    val load = RingRouter.queries("route_replica_load")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val primary = RingRouter.queries("route_ring_keys")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = primary.values.sum
    primary.foreach { case (node, n1) =>
      assert(load.getOrElse((node, 1L), 0L) === n1, s"primary load of $node")
    }
    (1 to RingRouter.ReplicaN).foreach { role =>
      val layer = load.collect { case ((_, r), n) if r == role => n }.sum
      assert(layer === total, s"role $role must cover every key once")
    }
  }

  test("quorum: one node down keeps R=2 reads for every key; W=3 degrades") {
    val rows = RingRouter.queries("route_quorum_availability")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // every key keeps >= ReplicaN - 1 distinct healthy replicas
    rows.foreach { case (h, readOk, writeOk, _, _) =>
      assert(h >= RingRouter.ReplicaN - 1 && h <= RingRouter.ReplicaN)
      assert(readOk, "R=2 must survive a single node failure")
      assert(writeOk === (h >= RingRouter.QuorumW))
    }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12, "shares sum to 1")
    // keys that lost a replica = keys whose preference list contains the
    // failed node, which is exactly the failed node's total replica load
    val load = RingRouter.queries("route_replica_load")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val failedLoad = load.collect {
      case (n, c) if n == RingRouter.FailedRingNode => c
    }.sum
    val degraded = rows.collect {
      case (h, _, _, n, _) if h == RingRouter.ReplicaN - 1 => n
    }.sum
    assert(degraded === failedLoad)
  }

  test("failover load spreads across ALL survivors — no dog-pile neighbor") {
    val rows = RingRouter.queries("route_failover_load")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val survivors = RingRouter.RingNodes.filterNot(_ == RingRouter.FailedRingNode)
    assert(rows.map(_._1).toSet === survivors.toSet,
      "every surviving node should absorb some of the orphaned primaries")
    // the vnode interleave bounds the takeover concentration: nobody
    // absorbs a majority (a physical-neighbor ring would send 100% to one)
    rows.foreach { case (n, _, share) =>
      assert(share < 0.6, s"$n absorbs $share of the failover load")
    }
    // orphan count ties out against the primary census of the failed node
    val primaries = RingRouter.queries("route_ring_keys")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._2).sum === primaries(RingRouter.FailedRingNode))
  }

  test("weighted ring: load tracks capacity; conservation holds") {
    val rows = RingRouter.queries("route_ring_weighted")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSet === RingRouter.WeightedVnodes.map(_._1).toSet,
      "every capacity-weighted node must own keys")
    val nKeys = graft.keyspace.KvLog.state(spark, sf).count()
    assert(rows.map(_._2).sum === nKeys, "placement must conserve the keyspace")
    rows.foreach { case (n, k, cap, ks, cs, ratio) =>
      assert(cap === RingRouter.WeightedVnodes.toMap.apply(n).toLong)
      assert(ks === k.toDouble / nKeys.toDouble)
      // vnode sampling noise at 32–96 vnodes stays well inside ±35%;
      // a capacity-blind placement puts n3 at ratio ≈ 0.58 (1/4 load on
      // 3/7 capacity) — the bound separates the two regimes
      assert(ratio > 0.65 && ratio < 1.35,
        s"$n: load/capacity ratio $ratio outside the weighted band")
    }
    // weighting must actually order the loads: the 96-vnode node carries
    // more keys than every 32-vnode node
    val byNode = rows.map(r => r._1 -> r._2).toMap
    assert(byNode("n3") > byNode("n1") && byNode("n3") > byNode("n4"),
      "3x capacity must attract more keys than 1x")
  }

  test("hinted handoff: holder is outside the list; census ties to replicas") {
    val rows = RingRouter.queries("route_hinted_handoff")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the hint holder is always a SURVIVOR (never the failed node), and
    // structurally never inside the key's own preference list: every
    // depth-(N+1) walk has N+1 distinct nodes, so slot 4 is outside the
    // first 3 by construction
    assert(rows.forall(_._1 != RingRouter.FailedRingNode))
    RingRouter.replicaSets(RingRouter.RingNodes, RingRouter.ReplicaN + 1)
      .foreach(wk => assert(wk.distinct.size == RingRouter.ReplicaN + 1))
    // per-role hint counts equal the failed node's replica-role census —
    // exactly the keys whose preference list contains it at that role
    val census = RingRouter.queries("route_replica_load")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    (1 to RingRouter.ReplicaN).foreach { role =>
      val hinted = rows.filter(_._2 == role.toLong).map(_._3).sum
      assert(hinted ==
        census.getOrElse((RingRouter.FailedRingNode, role.toLong), 0L),
        s"role $role hint census mismatch")
    }
    // shares are a distribution
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
  }

  test("rack-aware placement: every slot walk spans both racks") {
    // the invariant the constraint buys, proven over ALL vnode slots:
    // no rack holds all three replicas of any slot
    val sets = RingRouter.rackAwareSets(RingRouter.RingNodes,
      RingRouter.ReplicaN)
    sets.foreach { wk =>
      assert(wk.distinct.size == RingRouter.ReplicaN)
      assert(wk.map(RingRouter.NodeRacks).distinct.size >= 2,
        s"walk $wk is rack-concentrated")
      // the first two slots alone already span racks (a whole-rack
      // outage keeps a replica even at R=2 effective)
      assert(RingRouter.NodeRacks(wk(0)) != RingRouter.NodeRacks(wk(1)))
    }
    // census conserves the keyspace per role, and the primary never
    // moves (the constraint reorders only the tail)
    val rows = RingRouter.queries("route_rack_aware_load")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nKeys = KvLog.state(spark, sf).count()
    (1L to RingRouter.ReplicaN.toLong).foreach { role =>
      assert(rows.filter(_._2 == role).map(_._3).sum == nKeys, s"role $role")
    }
    assert(rows.filter(_._2 == 1L).forall(_._4 == 0L),
      "primary placement must be untouched by the rack constraint")
    // and the constraint genuinely reorders some tails on this ring
    assert(rows.filter(_._2 > 1L).map(_._4).sum > 0L)
  }

  test("growth sweep: movement tracks the capacity-proportional ideal") {
    val rows = RingRouter.queries("route_ring_growth_sweep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(5L, 6L, 7L))
    val nKeys = KvLog.state(spark, sf).count()
    rows.foreach { case (n, nk, moved, frac, ideal) =>
      assert(nk == nKeys)
      assert(frac == moved.toDouble / nk)
      assert(ideal == (n - 4).toDouble / n)
      // consistent hashing's guarantee, measured: movement sits near
      // the k/(4+k) ideal (vnode sampling noise band), nowhere near the
      // ~1-1/lcm reshuffle mod placement pays
      assert(math.abs(frac - ideal) < 0.08,
        s"growth to $n: moved $frac vs ideal $ideal")
    }
    // more joiners take strictly more keys
    val fracs = rows.map(_._4)
    assert(fracs.zip(fracs.drop(1)).forall { case (a, b) => a < b })
  }

  test("rack outage: anti-affinity pairs drive all-lost to exactly zero") {
    val rows = RingRouter.queries("route_rack_outage_compare")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    val nKeys = KvLog.state(spark, sf).count()
    assert(rows.keySet == Set("plain", "rack_aware"))
    rows.values.foreach { case (n, _, _, _) => assert(n == nKeys) }
    // plain R=2 pairs can land entirely in rack r1 (vnodes don't know
    // racks) — real data loss under the rack outage…
    val (_, plainLost, _, plainRate) = rows("plain")
    assert(plainLost > 0L,
      "fixture ring should expose rack-concentrated pairs")
    assert(plainRate < 1.0)
    // …while every anti-affinity pair spans racks by construction
    val (_, raLost, raLast, raRate) = rows("rack_aware")
    assert(raLost == 0L)
    assert(raRate == 1.0)
    // and after losing r1 whole, every rack-aware key sits on exactly
    // its surviving r2 copy
    assert(raLast == nKeys)
  }
}
