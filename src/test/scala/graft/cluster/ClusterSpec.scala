package graft.cluster

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cluster control-plane semantics (SURVEY.md §2.1 O8–O15), including an
  * independent fold-based re-implementation of the health state machine to
  * cross-check the gaps-and-islands windows.
  */
class ClusterSpec extends SparkSpec {

  test("register upsert: re-registration updates the address in place") {
    val rows = ClusterQueries.queries("register_upsert")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("n1") === "host-a:9011") // second registration wins
    assert(rows("n4") === "host-d:9004")
    assert(rows.size === 4)
  }

  test("routing: unassigned shard surfaces as null node (503 path)") {
    val rows = ClusterQueries.queries("route_key_to_node")(spark, sf).collect()
    assert(rows.length === 4) // n1, n2, n3, null
    assert(rows.head.isNullAt(0), "null node_id sorts first")
    assert(rows.map(_.getLong(1)).sum ===
      graft.keyspace.KvLog.state(spark, sf).count())
  }

  test("routing join broadcasts the assignment dimension") {
    val plan = ClusterQueries.queries("route_key_to_node")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("auto-assign: only unassigned shards move, ranked round-robin") {
    val got = ClusterQueries.queries("auto_assign_unassigned")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // shard 0 pre-assigned to n1; unassigned 1,2,3 get ranks 0,1,2
    assert(got.toSeq === Seq(0L -> "n1", 1L -> "n1", 2L -> "n2", 3L -> "n3"))
  }

  test("rebalance: shard i -> healthyNodes[i mod n], unhealthy excluded") {
    val got = ClusterQueries.queries("round_robin_rebalance")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.toSeq === Seq(0L -> "n1", 1L -> "n2", 2L -> "n3", 3L -> "n1"))
  }

  test("nodes_with_health: explicit-unhealthy wins; probed nodes get monitor status") {
    val rows = ClusterQueries.queries("nodes_with_health")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(rows("n4") === "unhealthy") // membership precedence, never probed
    assert(Set("healthy", "unhealthy").contains(rows("n1")))
  }

  test("de-registered node is pruned from the health snapshot (health_monitor.go:172-190)") {
    val pre = ClusterQueries.probesWithDereg(spark, sf)
    // n4 accumulated real tracking rows before de-registering…
    assert(pre.filter(col("node_id") === "n4").count() > 0)
    // …and the monitor stopped probing it at the de-registration
    assert(pre.filter(col("node_id") === "n4").agg(max("seq"))
      .first().getLong(0) < ClusterQueries.DeregSeq)
    // the snapshot prunes it; the registered nodes all remain
    val rows = ClusterQueries.queries("health_current_pruned")(spark, sf)
      .collect().map(_.getString(0))
    assert(rows.toSet === Set("n1", "n2", "n3"), rows.mkString(","))
  }

  test("node info rollup covers every shard exactly once") {
    val rows = ClusterQueries.queries("node_info_rollup")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === 4L, "4 shards accounted")
    val stats = graft.keyspace.KvLog.state(spark, sf)
    assert(rows.map(_.getLong(2)).sum === stats.count(),
      "per-node key totals partition the keyspace")
  }

  test("broadcast budget: sequential fan-out degrades partially, in membership order") {
    val rows = ClusterQueries.queries("broadcast_time_budget")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getString(3)))
      .toMap
    // n1 (900) + n2 (1400) + n3 (1500) = 3800 <= 4000; n4 blows the budget
    assert(rows("n1")._2 === "ok" && rows("n2")._2 === "ok" &&
      rows("n3")._2 === "ok")
    assert(rows("n4")._2 === "error: deadline exceeded")
    assert(rows("n4")._1 > ClusterQueries.BroadcastBudgetMs)
  }

  test("broadcast fan-out: unreachable node errors captured, rest ack") {
    val rows = ClusterQueries.queries("broadcast_fanout")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("n4") === "error: unreachable")
    assert(Seq("n1", "n2", "n3").forall(rows(_) == "ok"))
  }

  test("forgotten nodes are pruned: health rows for de-registered nodes drop") {
    // health_monitor.go:172-190 — tracking entries for nodes no longer in
    // membership are removed; our enrichment starts FROM membership so a
    // probed-but-deregistered node ('n9') never appears
    import spark.implicits._
    val strayProbes = Seq(("n9", 1L, false), ("n9", 2L, false),
      ("n1", 3L, true)).toDF("node_id", "seq", "ok")
    val current = strayProbes.groupBy("node_id")
      .agg(org.apache.spark.sql.functions.max_by(col("ok"), col("seq"))
        .as("last_ok"))
    val enriched = ClusterQueries.membership(spark)
      .join(current, Seq("node_id"), "left")
    val ids = enriched.select("node_id").collect().map(_.getString(0)).toSet
    assert(!ids.contains("n9") && ids === Set("n1", "n2", "n3", "n4"))
  }

  test("health transitions match an independent fold of the state machine") {
    val probes = ClusterQueries.probes(spark, sf)
      .orderBy("node_id", "seq").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getBoolean(2)))

    // reference semantics, folded imperatively per node
    // (health_monitor.go:221-254)
    val expected = probes.groupBy(_._1).toSeq.flatMap { case (node, ps) =>
      var fails = 0
      var status = "unknown"
      ps.sortBy(_._2).flatMap { case (_, seq, ok) =>
        val next =
          if (ok) { fails = 0; "healthy" }
          else { fails += 1; if (fails >= 3) "unhealthy" else status }
        if (next != status) { status = next; Some((node, seq, next)) }
        else None
      }
    }.sortBy(t => (t._1, t._2))

    val got = ClusterQueries.queries("health_transitions")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSeq
    assert(got === expected)
    assert(got.exists(_._3 == "unhealthy"), "failure blocks must trigger")
    assert(got.exists(_._3 == "healthy"), "recovery must trigger")
  }

  test("scattered single failures stay below the 3-consecutive threshold") {
    val st = ClusterQueries.probeStatus(spark, sf)
    // a lone failure (ok=false, n_fails<3) inside a healthy run keeps status
    val lone = st.filter(!col("ok") && col("n_fails") < 3 &&
      col("status") === "unhealthy")
    // such rows may only occur while already unhealthy from an earlier run;
    // assert the machine never flips healthy->unhealthy below threshold
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("node_id").orderBy("seq")
    val bad = st.withColumn("prev", lag(col("status"), 1, "unknown").over(w))
      .filter(col("status") === "unhealthy" && col("prev") =!= "unhealthy" &&
        col("n_fails") < 3)
    assert(bad.count() === 0)
    assert(lone.schema.nonEmpty) // touch to avoid unused warning
  }
}
