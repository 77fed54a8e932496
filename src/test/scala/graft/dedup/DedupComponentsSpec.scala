package graft.dedup

import graft.SparkSpec

class DedupComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("label propagation: chains collapse to the min id, islands stay apart") {
    // chain 1-2-3 (diameter 2, needs >1 round) + isolated pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = DedupComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("near-dup components: every paired doc labeled, one canonical per component") {
    val rows = DedupComponents.queries("dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.count(_._3) === 1, s"component $comp canonical count")
      assert(members.map(_._1).min === comp, s"component id is min doc_id")
    }
    val paired = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(_._1).toSet === paired)
  }

  test("star contraction: chains collapse to the min id, islands stay apart") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = DedupComponents.componentsStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("star contraction: logarithmic rounds on a path where label-prop pays the diameter") {
    // a 200-hop path: label propagation would need ~200 rounds (its cap
    // is 50 — it cannot even finish); star contraction halves the path
    // every alternation and lands well under 2·log2(200) ≈ 16
    val path = (0L until 200L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = DedupComponents.componentsStarWithRounds(path)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 200 && got.forall(_._2 === 0L))
    assert(rounds <= 16, s"star contraction took $rounds rounds on a 200-path")
  }

  test("star contraction keeps self-loop-only vertices, like label propagation") {
    // a vertex whose only edge is reflexive must stay a singleton
    // component in BOTH implementations, not vanish from the star form
    val edges = Seq((7L, 7L), (1L, 2L)).toDF("doc_a", "doc_b")
    val expected = Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
    val viaProp = DedupComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = DedupComponents.componentsStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaProp === expected)
    assert(viaStar === expected)
  }

  test("star contraction agrees with label propagation on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 120
      val edges = Seq.fill(140)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .toDF("doc_a", "doc_b")
      val viaProp = DedupComponents.components(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaStar = DedupComponents.componentsStar(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStar === viaProp)
    }
  }

  test("BFS hops: a chain reports true distances from the canonical") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = DedupComponents.bfsFromCanonicals(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      10L -> 0L, 11L -> 1L))
  }

  test("BFS hops agree with components: zero exactly at canonicals, steps of one") {
    val hops = DedupComponents.queries("graph_bfs_hops")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comp = DedupComponents.queries("dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(hops.keySet === comp.map(_._1).toSet,
      "BFS must cover exactly the component members")
    comp.foreach { case (id, _, canonical) =>
      assert((hops(id) === 0L) === canonical, s"hops(${id}) vs canonical")
    }
    // every non-canonical vertex has a neighbor one hop closer
    val adj = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().flatMap(r => Seq(r.getLong(0) -> r.getLong(1),
        r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    hops.foreach { case (id, h) =>
      if (h > 0) assert(adj(id).exists(nb => hops(nb) === h - 1))
    }
  }

  test("weighted SSSP matches a driver-side Dijkstra exactly; rounds pinned") {
    val scored = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
    val (df, rounds) = DedupComponents.ssspFromCanonicalsWithRounds(scored)
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    // the oracle explores at most SsspMaxHops hops — the loop must have
    // found its fixed point strictly inside that budget
    assert(rounds < DedupComponents.SsspMaxHops, s"unconverged in $rounds")

    // driver-side multi-source Dijkstra on the same integer weights
    val edges = scored.collect().map(r =>
      (r.getLong(0), r.getLong(1),
        math.floor((1.0 - r.getDouble(2)) * DedupComponents.SsspFp + 0.5)
          .toLong))
    val adj = edges.flatMap { case (a, b, w) => Seq(a -> (b, w), b -> (a, w)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val canonicals = DedupComponents.queries("dedup_components")(spark, sf)
      .collect().filter(_.getBoolean(2)).map(_.getLong(0))
    val dist = collection.mutable.Map(canonicals.map(_ -> 0L): _*)
    val pq = collection.mutable.PriorityQueue(
      canonicals.map(c => (-0L, c)): _*)(Ordering.by(_._1))
    while (pq.nonEmpty) {
      val (nd, u) = pq.dequeue()
      if (-nd == dist(u))
        adj.getOrElse(u, Array.empty[(Long, Long)]).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > -nd + w)) {
            dist(v) = -nd + w
            pq.enqueue((nd - w, v))
          }
        }
    }
    val expect = dist.map { case (k, v) =>
      k -> v.toDouble / DedupComponents.SsspFp
    }.toMap
    assert(got === expect)
    // weighted distance is consistent with hop distance: nonzero exactly
    // off the canonicals, and never more than max-weight × hops
    val hops = DedupComponents.queries("graph_bfs_hops")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === hops.keySet)
    got.foreach { case (id, d) =>
      assert((d == 0.0) === (hops(id) == 0L))
      assert(d <= hops(id) * (1.0 - DedupQueries.JaccardThreshold) + 1e-9,
        s"dist($id)=$d exceeds per-hop weight bound over ${hops(id)} hops")
    }
  }

  test("degree histogram: handshake law and full dup-graph coverage") {
    val hist = DedupComponents.queries("graph_degree_hist")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.nonEmpty)
    assert(hist.map(_._1).toSeq === hist.map(_._1).sorted.toSeq)
    assert(hist.forall { case (deg, n) => deg >= 1 && n >= 1 })
    val nEdges = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf).count()
    // Σ degree·n_docs counts each undirected edge twice
    assert(hist.map { case (d, n) => d * n }.sum === 2L * nEdges,
      "handshake law violated")
    // Σ n_docs = every doc that appears in the dup graph = components rows
    val members = DedupComponents.queries("dedup_components")(spark, sf).count()
    assert(hist.map(_._2).sum === members,
      "histogram must cover exactly the dup-graph members")
  }

  test("assortativity: bit-equal to the driver Pearson over the edge list") {
    val Array(row) = DedupComponents.queries("graph_assortativity")(spark, sf)
      .collect()
    val (m, r) = (row.getLong(0), row.getDouble(1))
    val pairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val und = pairs ++ pairs.map { case (a, b) => (b, a) }
    assert(m === und.length.toLong)
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ks = und.map { case (s, d) => (deg(s), deg(d)) }
    val (sx, sy) = (ks.map(_._1).sum, ks.map(_._2).sum)
    val sxy = ks.map { case (x, y) => x * y }.sum
    val sxx = ks.map { case (x, _) => x * x }.sum
    val syy = ks.map { case (_, y) => y * y }.sum
    val (dx, dy) = (m * sxx - sx * sx, m * syy - sy * sy)
    assert(dx != 0L && dy != 0L, "fixture graph should have degree variance")
    val expect = (m * sxy - sx * sy).toDouble /
      math.sqrt(dx.toDouble * dy.toDouble)
    assert(r === expect, "assortativity differs from the driver Pearson")
    assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12)
  }

  test("component-size histogram conserves the corpus and the components") {
    val hist = DedupComponents
      .queries("dedup_component_sizes")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.nonEmpty)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(hist.map { case (k, n) => k * n }.sum === nDocs,
      "Σ k·n(k) must equal the corpus size (singletons included)")
    // multi-doc entries must agree with the components query directly
    val comp = DedupComponents.queries("dedup_components")(spark, sf)
      .collect().map(r => r.getLong(1))
      .groupBy(identity).map(_._2.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    hist.filter(_._1 >= 2).foreach { case (k, n) =>
      assert(comp.getOrElse(k, 0L) === n,
        s"size-$k component count differs from the components query")
    }
    hist.foreach { case (k, n) => assert(k >= 1 && n >= 1) }
  }
}
