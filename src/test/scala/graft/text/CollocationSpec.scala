package graft.text

import graft.SparkSpec

/** PMI collocations against a direct driver-side recomputation from the
  * raw tokenized corpus — the definition, not the join plan. */
class CollocationSpec extends SparkSpec {

  test("pmi bigrams: top-k lift table equals the textbook computation") {
    val got = CollocationQueries.queries("text_pmi_bigrams")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val toks = docs.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val n1 = uni.values.sum
    val pairs = toks.filter(_.size >= 2)
      .flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n2 = pairs.values.sum
    val expected = pairs.toSeq
      .filter(_._2 >= CollocationQueries.MinPairCount)
      .map { case ((w1, w2), c12) =>
        val (c1x, c1y) = (uni(w1), uni(w2))
        val lift = (c12 * n1).toDouble * n1 / (n2.toDouble * c1x * c1y)
        (w1, w2, c12, c1x, c1y, lift)
      }
      .sortBy(x => (-x._6, x._1, x._2))
      .take(CollocationQueries.TopK)
    assert(got.toSeq == expected)
    assert(got.nonEmpty)
    // observed-over-expected: every reported collocation is enriched
    // (the corpus has planted phrases), and counts respect the cut
    assert(got.forall(_._3 >= CollocationQueries.MinPairCount))
    assert(got.head._6 >= got.last._6)
  }
}
