package graft.sim

import graft.SparkSpec

/** The truncated-prefix retrieval against its own contract: shape,
  * bounds, and the rerank-dominates-ablation law (reranking a superset
  * of the ablation's top-5 with the TRUTH metric can only help). */
class MatryoshkaSpec extends SparkSpec {

  private lazy val rows =
    MatryoshkaQueries.queries("sim_trunc_recall")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  test("shape: 2 methods x 10 fixed queries, hits within [0,5]") {
    assert(rows.length == 20)
    assert(rows.map(_._2).distinct.sorted.toSeq ==
      Seq("trunc16_only", "trunc16_rerank"))
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 5))
    assert(rows.forall(r => r._4 == r._3 / 5.0))
  }

  test("full-precision rerank never loses to the prefix-only ranking") {
    val byQ = rows.groupBy(_._1)
    byQ.values.foreach { qs =>
      val rerank = qs.find(_._2 == "trunc16_rerank").get._3
      val only = qs.find(_._2 == "trunc16_only").get._3
      assert(rerank >= only,
        s"rerank $rerank < prefix-only $only for q ${qs.head._1}")
    }
    // the fixture embedding is NOT Matryoshka-trained (dims are
    // isotropic), so prefix recall is modest by construction — the
    // honest measurement. Assert the pipeline still finds signal and
    // the rerank phase strictly adds over the ablation in aggregate.
    val rerankSum = rows.filter(_._2 == "trunc16_rerank").map(_._3).sum
    val onlySum = rows.filter(_._2 == "trunc16_only").map(_._3).sum
    assert(rerankSum > 0)
    assert(rerankSum >= onlySum)
  }

  test("truth rank: reciprocal is exact; candidate cut law ties to recall") {
    val tr = MatryoshkaQueries.queries("sim_truth_rank")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(tr.length == 10)
    tr.foreach { case (_, _, rank, rr) =>
      assert(rank >= 1)
      assert(rr == 1.0 / rank)
    }
    // if the true NN lands inside the candidate cut, the full-precision
    // rerank MUST recover it (it wins the rerank ordering outright) —
    // the law that makes prefix_rank the statistic that sizes CandidateK
    val rerankHits = rows.filter(_._2 == "trunc16_rerank")
      .map(r => r._1 -> r._3).toMap
    tr.foreach { case (q, _, rank, _) =>
      if (rank <= MatryoshkaQueries.CandidateK)
        assert(rerankHits(q) >= 1,
          s"q $q: truth at prefix rank $rank inside K but rerank missed it")
    }
  }

  test("recall curve: laws tie it to truth-rank and the recall legs") {
    val curve = MatryoshkaQueries.queries("sim_recall_curve")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3)))).toMap
    assert(curve.size == 10 * MatryoshkaQueries.RecallKs.size)
    curve.foreach { case ((_, k), (hits, rec)) =>
      assert(hits >= 0 && hits <= k)
      assert(rec == hits.toDouble / k)
    }
    // absolute hit count is monotone in k (top-k sets are nested)
    val byQ = curve.toSeq.groupBy(_._1._1)
    byQ.values.foreach { qs =>
      val sorted = qs.sortBy(_._1._2).map(_._2._1)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a <= b })
    }
    // recall@1 agrees with sim_truth_rank: hit iff the truth NN sits at
    // prefix rank 1
    val tr = MatryoshkaQueries.queries("sim_truth_rank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    tr.foreach { case (q, rank) =>
      assert(curve((q, 1L))._1 == (if (rank == 1L) 1L else 0L), s"q $q")
    }
  }

  test("nprobe sweep: recall monotone in probes; nprobe=2 matches NProbe leg") {
    val sweep = MatryoshkaQueries
      .queries("sim_ivf_nprobe_sweep")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(sweep.size == 10 * MatryoshkaQueries.NProbes.size)
    // probing more cells can only grow the candidate set: hits monotone
    sweep.keys.map(_._1).toSeq.distinct.foreach { q =>
      val hs = MatryoshkaQueries.NProbes.map(p => sweep((q, p.toLong)))
      assert(hs.zip(hs.drop(1)).forall { case (a, b) => a <= b }, s"q $q")
    }
    // the sweep's nprobe=2 leg IS sim_ann_recall's ivf leg — same
    // candidates, same truth
    val ivf = SimilarityQueries.queries("sim_ann_recall")(spark, sf)
      .collect()
      .filter(_.getString(1) == "ivf")
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    ivf.foreach { case (q, hits) =>
      assert(sweep((q, SimilarityQueries.NProbe.toLong)) == hits, s"q $q")
    }
  }
}
