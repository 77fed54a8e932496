package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
        acc + p.toDouble * q.toDouble
      }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("brute-force top-k matches a driver-side reference ranking") {
    val vs = vecs
    val q = vs(0L)
    val expected = vs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosRef(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(SimilarityQueries.TopK)
    val got = SimilarityQueries.queries("sim_topk_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("top-k plan is TakeOrdered, not a full global sort") {
    val plan = SimilarityQueries.queries("sim_topk_bruteforce")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("LSH buckets spread the corpus and partition it exactly") {
    val rows = SimilarityQueries.queries("sim_lsh_buckets")(spark, sf)
      .collect()
    assert(rows.length > 16, s"only ${rows.length} buckets used")
    assert(rows.map(_.getLong(1)).sum ===
      spark.read.parquet(s"$sf/embeddings.parquet").count())
  }

  test("ANN candidates come from the query's coarse bucket with exact cosines") {
    val vs = vecs
    val got = SimilarityQueries.queries("sim_ann_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, c) =>
      assert(math.abs(c - cosRef(vs(0L), vs(id))) < 1e-12)
    }
  }

  test("IVF ANN: exact cosines, query vector excluded, nonempty probe") {
    val vs = vecs
    val got = SimilarityQueries.queries("sim_ivf_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    assert(!got.exists(_._1 == SimilarityQueries.QueryVec))
    got.foreach { case (id, c) =>
      assert(math.abs(c - cosRef(vs(SimilarityQueries.QueryVec), vs(id))) < 1e-12)
    }
    // scores descend
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sortBy(-_))
  }

  test("embedding near-dup pairs are canonical and above threshold") {
    val pairs = SimilarityQueries.queries("dedup_embedding_cosine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= SimilarityQueries.CosineThreshold)
    }
  }

  test("banded-LSH near-dup: precision 1 vs the exact baseline, recall measured") {
    val exact = SimilarityQueries.queries("dedup_embedding_cosine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = SimilarityQueries.queries("dedup_embedding_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ann.nonEmpty)
    // precision 1: every ANN pair is an exact-baseline pair, bit-equal score
    ann.foreach { case (pair, c) =>
      assert(exact.contains(pair), s"$pair not in exact baseline")
      assert(exact(pair) === c, s"$pair cosine differs from baseline")
    }
    // recall: banding theory says ≥ ~1-(1-p^4)^4 per pair (p grows with
    // cosine); planted near-dups are high-cosine, so corpus recall on the
    // fixture sits well above the 0.45-threshold floor. Deterministic
    // planes + data ⇒ a fixed number; bound it loosely as a regression pin.
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.5, f"banded-LSH recall collapsed: $recall%.2f")
  }

  test("k-means cells partition the corpus and rerun bit-identically") {
    val run1 = SimilarityQueries.queries("sim_kmeans_cells")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(run1.map(_._2).sum === total, "every vector lands in one cell")
    assert(run1.length <= SimilarityQueries.KmeansK)
    assert(run1.forall(_._3 > 0.0))
    val run2 = SimilarityQueries.queries("sim_kmeans_cells")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(run1.toSeq === run2.toSeq, "fixed-point means must be deterministic")
  }

  test("int8 quantization: codes bounded, dequantized error ≤ scale/2") {
    import org.apache.spark.sql.functions._
    val q = SimilarityQueries.queries("embed_quantize_int8")(spark, sf)
      .collect()
    assert(q.length ===
      spark.read.parquet(s"$sf/embeddings.parquet").count())
    q.foreach { r =>
      assert(r.getLong(3) >= -127L && r.getLong(4) <= 127L) // q_min, q_max
    }
    // per-element reconstruction bound on a sample of vectors
    val vs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 50)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vs.foreach { case (_, v) =>
      val mx = v.map(x => math.abs(x.toDouble)).max
      val scale = mx / 127.0
      if (scale > 0) v.foreach { x =>
        val q8 = math.floor(x.toDouble / scale + 0.5)
        assert(math.abs(q8 * scale - x.toDouble) <= scale / 2 + 1e-12)
        assert(q8 >= -127 && q8 <= 127)
      }
    }
  }

  test("semantic dedup ledger partitions every cell and prunes something") {
    val rows = SimilarityQueries.queries("dedup_semantic")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_._2).sum === total, "cells must cover the corpus")
    rows.foreach { case (_, m, d, k) =>
      assert(k === m - d && d >= 0 && k >= 0)
    }
    assert(rows.map(_._3).sum > 0, "threshold should prune near-dups")
    // spot-check: every dropped count is bounded by its cell's pair count
    rows.foreach { case (_, m, d, _) => assert(d < m) }
  }

  test("label centroids: partition, cohesion bounds, determinism") {
    def run() = SimilarityQueries.queries("sim_label_centroids")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val rows = run()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_._2).sum === total, "labels must cover the corpus")
    rows.foreach { case (_, n, avgCos, normSq) =>
      assert(n > 0 && normSq > 0.0)
      // members correlate positively with their own class prototype and
      // cosine never exceeds 1 (fixed-point grid adds ≤ 2^-21 slack)
      assert(avgCos > 0.0 && avgCos <= 1.0 + 1e-6)
    }
    assert(rows.toSeq === run().toSeq, "fixed-point means must be stable")
  }

  test("multiprobe: per-query recall dominates single-probe, probes well-formed") {
    val rows = SimilarityQueries.queries("sim_ann_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byMethod = rows.groupBy(_._2)
      .view.mapValues(_.map(r => r._1 -> r._3).toMap).toMap
    assert(byMethod.keySet === Set("lsh", "ivf", "multiprobe"))
    // the probe set strictly contains the single-probe bucket, so the
    // candidate set is a superset and per-query recall can only grow
    byMethod("lsh").foreach { case (q, lshHits) =>
      assert(byMethod("multiprobe")(q) >= lshHits,
        s"query $q: multiprobe recall fell below single-probe")
    }
    // the fixture actually exercises the extra probes: at least one
    // query must gain hits, else the leg measures nothing
    assert(byMethod("lsh").exists { case (q, h) =>
      byMethod("multiprobe")(q) > h },
      "no query gained recall from multiprobe on this fixture")
  }

  test("kNN join: degree <= k, dense ranks, and a full driver-side recheck") {
    val vs = vecs
    val buckets = SimilarityQueries.bucketed(spark, sf)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SimilarityQueries.queries("sim_knn_join")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, nbrs) =>
      assert(nbrs.length <= SimilarityQueries.KnnK)
      assert(nbrs.map(_._4).sorted.toSeq === (1L to nbrs.length).toSeq)
    }
    // every vector with a bucket-mate appears with exactly its top-k
    // neighbors; reference ranking recomputed driver-side
    val byBucket = buckets.toSeq.groupBy(_._2)
      .map { case (b, ids) => b -> ids.map(_._1).sorted }
    val got = rows.groupBy(_._1)
    byBucket.values.filter(ids =>
        ids.length >= 2 &&
          ids.length <= graft.dedup.DedupQueries.MaxPosting).foreach { ids =>
      ids.foreach { v =>
        val expected = ids.filter(_ != v)
          .map(n => (n, cosRef(vs(v), vs(n))))
          .sortBy { case (n, c) => (-c, n) }
          .take(SimilarityQueries.KnnK)
        val actual = got(v).sortBy(_._4).map(t => (t._2, t._3)).toSeq
        assert(actual === expected, s"kNN mismatch for vec $v")
      }
    }
  }

  test("hard negatives: one hardest different-label bucket-mate per vector") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = SimilarityQueries.queries("sim_hard_negatives")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (v, l, n, nl, _) =>
      assert((l === labels(v)) && (nl === labels(n)) && (l !== nl))
    }
    // the pick is the HARDEST negative: max cosine among different-label
    // bucket-mates, driver-side recheck
    val vs = vecs
    val buckets = SimilarityQueries.bucketed(spark, sf)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byBucket = buckets.toSeq.groupBy(_._2)
      .map { case (b, ids) => b -> ids.map(_._1) }
    rows.foreach { case (v, _, n, _, c) =>
      val mates = byBucket(buckets(v))
        .filter(m => m != v && labels(m) != labels(v))
        .map(m => (m, cosRef(vs(v), vs(m))))
      val best = mates.minBy { case (m, cm) => (-cm, m) }
      assert((n, c) === best, s"not the hardest negative for vec $v")
    }
  }

  test("covariance: upper triangle, diagonal ties bit-exactly to dim stats") {
    val cov = SimilarityQueries.queries("embed_covariance")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    val d = SimilarityQueries.Dim
    assert(cov.size === d * (d + 1) / 2)
    cov.keys.foreach { case (i, j) => assert(i <= j && j < d) }
    val stats = SimilarityQueries.queries("embed_dim_stats")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    (0L until d.toLong).foreach { i =>
      val (exy, c) = cov((i, i))
      val (mean, meanSq) = stats(i)
      // identical fixed-point derivations ⇒ identical doubles
      assert(exy === meanSq, s"E[x²] drift at dim $i")
      assert(c === meanSq - mean * mean, s"variance drift at dim $i")
      assert(c >= -2.0 / SimilarityQueries.KmeansFp) // rounding floor only
    }
  }

  test("PQ codes: every vector coded, codes in range, qerr is a true min") {
    val vs = vecs
    val rows = SimilarityQueries.queries("sim_pq_codes")(spark, sf).collect()
    assert(rows.length === vs.size)
    rows.foreach { r =>
      (1 to SimilarityQueries.PqM).foreach { j =>
        val code = r.getLong(j)
        assert(code >= 0 && code < SimilarityQueries.PqK)
      }
      assert(r.getDouble(1 + SimilarityQueries.PqM) >= 0.0)
    }
    // the whole chain (4 subspace k-means + encode) is deterministic:
    // a rerun is bit-identical, including the double-valued qerr
    val again = SimilarityQueries.queries("sim_pq_codes")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("PQ ADC: Minkowski bound |sqrt(adc) - sqrt(exact)| <= sqrt(qerr)") {
    val vs = vecs
    val q = vs(0L)
    def l2sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (p, r)) =>
        acc + (p.toDouble - r.toDouble) * (p.toDouble - r.toDouble)
      }
    val qerr = SimilarityQueries.queries("sim_pq_codes")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1 + SimilarityQueries.PqM)).toMap
    val ann = SimilarityQueries.queries("sim_pq_ann")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ann.length === 5)
    assert(ann.map(_._2).toSeq === ann.map(_._2).sorted.toSeq)
    // asymmetric distance: adc(v) = ||q - reconstruction(v)||² exactly
    // (the exact query slices face the codewords), so by the triangle
    // inequality |sqrt(adc) - sqrt(exact)| <= ||v - reconstruction(v)||
    // = sqrt(qerr(v)) — a theorem, not a tolerance
    ann.foreach { case (id, adc) =>
      assert(id !== 0L)
      assert(adc >= 0.0)
      val exact = l2sq(q, vs(id))
      assert(math.abs(math.sqrt(adc) - math.sqrt(exact)) <=
        math.sqrt(qerr(id)) + 1e-9,
        s"ADC bound violated for vec $id: adc=$adc exact=$exact " +
          s"qerr=${qerr(id)}")
    }
  }

  test("int8 rerank: exact final cosines, full recall of the true top-5") {
    val reranked = SimilarityQueries
      .queries("sim_ann_int8_rerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(reranked.length === 5)
    val vs = vecs
    val q = vs(0L)
    // final scores are the EXACT cosine (the rerank leg), not approximate
    reranked.foreach { case (id, _, cos) =>
      assert(math.abs(cos - cosRef(q, vs(id))) < 1e-12)
    }
    // the 25-candidate int8 cut preserves the exact brute-force top-5 on
    // the fixture (recall@5 = 1.0, deterministic)
    val truth = vs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosRef(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    assert(reranked.map(_._1).toSet === truth)
    // approximate scores rank-correlate with the exact ones inside the
    // candidate set: the quantization error bound is 64·s_a·s_q·127.25,
    // far below the separation between retained candidates
    reranked.foreach { case (id, approx, _) =>
      val exactDot = vs(id).zip(q).foldLeft(0.0) { case (a, (p, r)) =>
        a + p.toDouble * r.toDouble
      }
      val sA = vs(id).map(v => math.abs(v.toDouble)).max / 127.0
      val sQ = q.map(v => math.abs(v.toDouble)).max / 127.0
      assert(math.abs(approx - exactDot) <= 64.0 * sA * sQ * 127.25)
    }
  }

  test("kNN k-core: defining degree law, containment, pinned convergence") {
    val (coreDf, rounds) = SimilarityQueries.knnKCoreWithRounds(spark, sf)
    val core = coreDf.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.nonEmpty, "the fixture's kNN graph must have a 3-core")
    // THE defining property: every survivor keeps >= k neighbors that
    // themselves survived
    core.values.foreach(d => assert(d >= SimilarityQueries.KCoreK))
    // containment: the core is a subgraph of the kNN graph's vertex set
    val knnVerts = SimilarityQueries.queries("sim_knn_join")(spark, sf)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(core.keySet.subsetOf(knnVerts))
    // convergence is pinned: a fixture regen that changes the peel depth
    // fails loudly here (raise KCoreMaxIters = the oracle unroll if it
    // ever approaches the cap)
    assert(rounds < SimilarityQueries.KCoreMaxIters, s"no fixed point: $rounds")
    assert(rounds === 2, s"peel depth moved: $rounds rounds")
  }

  test("top eigvec: L-inf normalized, Rayleigh in bounds, residual small") {
    val rows = SimilarityQueries.queries("embed_top_eigvec")(spark, sf)
      .collect()
    assert(rows.length == SimilarityQueries.Dim)
    val comp = rows.map(r => r.getLong(0) -> r.getDouble(1))
      .sortBy(_._1).map(_._2)
    val eig = rows.head.getDouble(2)
    assert(rows.forall(_.getDouble(2) == eig), "eigval constant across rows")
    assert(comp.map(math.abs).max == 1.0, "L-inf normalized output")
    // driver-side residual check on the true (double) covariance: after
    // PowerIters rounds, C·v must be nearly parallel to λ·v
    val cov = SimilarityQueries.queries("embed_covariance")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
      .toMap
    def c(i: Int, j: Int): Double =
      cov.getOrElse((i.toLong, j.toLong), cov((j.toLong, i.toLong)))
    val n = comp.length
    val cv = Array.tabulate(n)(i => (0 until n).map(j => c(i, j) * comp(j)).sum)
    val trace = (0 until n).map(i => c(i, i)).sum
    assert(eig > 0 && eig <= trace + 1e-9, s"eig=$eig trace=$trace")
    assert(eig >= trace / n, "dominant eigenvalue at least the average")
    val resid = math.sqrt(
      cv.zip(comp).map { case (a, b) => val d = a - eig * b; d * d }.sum) /
      math.sqrt(comp.map(x => x * x).sum)
    assert(resid / eig < 0.03, s"unconverged: residual=$resid eig=$eig")
  }

  test("pca projection: per-label stats equal an exact driver recompute") {
    val rows = SimilarityQueries.queries("embed_pca_projection")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // recover the integer eigvector from the (exact) component doubles
    val vfp = SimilarityQueries.queries("embed_top_eigvec")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1048576.0))
      .toMap
    val den = 1099511627776.0 // 2^40
    val proj = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        r.getInt(2).toLong -> e.zipWithIndex.map { case (x, j) =>
          math.floor(x.toDouble * 1048576.0 + 0.5).toLong * vfp(j.toLong)
        }.sum
      }
    val byLab = proj.groupBy(_._1)
    rows.foreach { r =>
      val ps = byLab(r.getLong(0)).map(_._2)
      assert(r.getLong(1) == ps.length)
      assert(r.getDouble(2) == ps.sum.toDouble / (ps.length * den))
      assert(r.getDouble(3) == ps.min.toDouble / den)
      assert(r.getDouble(4) == ps.max.toDouble / den)
    }
  }

  test("mips: top-k bit-equal to a driver fold; reduction preserves rank") {
    val rows = SimilarityQueries.queries("sim_mips_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.map(_._1).toSeq === (1L to 10L), "ranks 1..10 in order")
    // the norm-augmentation reduction must not perturb the ranking on
    // this corpus (constant augmented norm ⇒ cosine ∝ inner product)
    assert(rows.forall(_._5), "augmented-cosine rank disagrees with IP rank")
    // exact replication of Dot64's left-to-right double fold
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val q = vecs.find(_._1 == 0L).get._2
    def ip(a: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * q(i); i += 1 }
      acc
    }
    val expect = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, ip(v)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(10)
    assert(rows.map(r => (r._2, r._3)).toSeq === expect.toSeq,
      "top-10 inner products differ from the exact driver fold")
  }

  test("graph ppr: descending mass per seed, and the walk reaches " +
      "beyond the seed's direct kNN neighbors") {
    val qd = graft.retrieval.RetrievalQueries.QueryDocs.toSet
    val rows = SimilarityQueries.queries("ret_graph_ppr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // a seed with no out-edges in the bucket-capped kNN graph (an
    // isolated doc) legitimately gets no expansion — seed 7 at sf0.001
    val seedsWithResults = rows.groupBy(_._1).keySet
    assert(seedsWithResults.subsetOf(qd) && seedsWithResults.size >= 2,
      s"unexpected seed set $seedsWithResults")
    val knn1 = SimilarityQueries.queries("sim_knn_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var reachedBeyond = false
    for ((seed, rs) <- rows.groupBy(_._1)) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rs.length).toSeq)
      val ps = sorted.map(_._4).toSeq
      assert(ps == ps.sorted.reverse, s"seed $seed not descending")
      assert(ps.forall(p => p > 0.0 && p < 1.0), s"seed $seed mass range")
      assert(!sorted.exists(_._3 == seed), "seed retrieved itself")
      val oneHop = knn1.getOrElse(seed, Set.empty)
      if (sorted.exists(r => !oneHop.contains(r._3))) reachedBeyond = true
    }
    assert(reachedBeyond,
      "every PPR result is a direct neighbor — the multi-hop walk is vacuous")
  }

  test("centroid outliers: bottom-k per label, genuinely the least " +
      "cohesive members") {
    val out = SimilarityQueries.queries("sim_centroid_outliers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label").distinct().count()
    assert(out.groupBy(_._1).keySet.size.toLong == labels)
    val avg = SimilarityQueries.queries("sim_label_centroids")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for ((label, rs) <- out.groupBy(_._1)) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq ==
        (1L to rs.length).toSeq, s"label $label ranks")
      assert(rs.length <= SimilarityQueries.OutlierK)
      // ranked ascending by centroid cosine: rank 1 is the worst fit
      val cs = sorted.map(_._4).toSeq
      assert(cs == cs.sorted, s"label $label not ascending: $cs")
      // outliers sit below the label's average cohesion (the
      // sim_label_centroids avg_cos for the same label)
      assert(cs.head <= avg(label),
        s"label $label worst member ${cs.head} above its mean ${avg(label)}")
    }
  }
}
