package graft.sim

import graft.SparkSpec

/** IVF-PQ serving invariants, rechecked driver-side from raw embeddings:
  * every returned neighbor must live in one of the query's NProbe probed
  * cells (the IVF contract), and the ADC ranking must come back sorted.
  * The ADC arithmetic itself is oracle-checked bit-for-bit by the driver
  * gate; this spec pins the cell-pruning semantics. */
class IvfPqSpec extends SparkSpec {

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("residual variant prunes to the same probed cells, sorted ADC") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toIndexedSeq)
      .toMap
    val centroids = vecs.filter(_._1 < SimilarityQueries.NumCells)
    def nearest(v: IndexedSeq[Double], n: Int): Seq[Long] =
      centroids.toSeq.map { case (cell, c) => (cell, cos(v, c)) }
        .sortBy { case (cell, s) => (-s, cell) }.take(n).map(_._1)
    val probed = nearest(vecs(SimilarityQueries.QueryVec),
      SimilarityQueries.NProbe).toSet
    val hits = graft.SparkEntry.queries("sim_ivfpq_residual_ann")(spark, sf)
      .collect()
    assert(hits.length == 5)
    val dists = hits.map(_.getDouble(1))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    for (h <- hits)
      assert(probed.contains(nearest(vecs(h.getLong(0)), 1).head))
  }

  test("pq recall: probabilities consistent; cell pruning never adds hits") {
    val rows = graft.SparkEntry.queries("sim_pq_recall")(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getLong(0)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.nonEmpty && rows.keys.map(_._1).toSet == Set("pq", "ivfpq"))
    for (((_, _), (hits, recall)) <- rows) {
      assert(hits >= 0 && hits <= 5)
      assert(recall == hits / 5.0)
    }
    // the ivfpq candidate set is a SUBSET of the pq leg's (same ADC
    // ranking, cell-pruned) — wherever pruning drops a true neighbor the
    // recall falls, it can never rise above the unpruned leg... except
    // when pruning evicts a FALSE positive from the top-5 and a true
    // neighbor slides in. Assert the sane aggregate instead: mean ivfpq
    // recall within one hit/query of mean pq recall, both positive.
    val qids = rows.keys.map(_._2).toSet
    val pqMean = qids.toSeq.map(q => rows(("pq", q))._2).sum / qids.size
    val ipqMean = qids.toSeq.map(q => rows(("ivfpq", q))._2).sum / qids.size
    assert(pqMean > 0.0, "plain PQ found nothing — codebooks degenerate?")
    assert(ipqMean <= pqMean + 0.2,
      s"cell-pruned recall $ipqMean implausibly above unpruned $pqMean")
  }

  test("every ivfpq hit sits in one of the query's probed cells") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toIndexedSeq)
      .toMap
    val centroids = vecs.filter(_._1 < SimilarityQueries.NumCells)
    def nearestCells(v: IndexedSeq[Double], n: Int): Seq[Long] =
      centroids.toSeq
        .map { case (cell, c) => (cell, cos(v, c)) }
        .sortBy { case (cell, s) => (-s, cell) }
        .take(n).map(_._1)

    val probed = nearestCells(vecs(SimilarityQueries.QueryVec),
      SimilarityQueries.NProbe).toSet
    val hits = graft.SparkEntry.queries("sim_ivfpq_ann")(spark, sf).collect()
    assert(hits.length == 5)
    val dists = hits.map(_.getDouble(1))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
      "ADC distances not ascending")
    for (h <- hits) {
      val id = h.getLong(0)
      assert(id != SimilarityQueries.QueryVec)
      val own = nearestCells(vecs(id), 1).head
      assert(probed.contains(own),
        s"hit $id assigned to cell $own outside probed $probed")
    }
  }
}
