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
}
