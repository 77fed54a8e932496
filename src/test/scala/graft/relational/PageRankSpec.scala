package graft.relational

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  test("ranks form a distribution and the computation is deterministic") {
    val full = PageRank.ranks(spark, sf)
    val ranks = full.collect().map(_.getDouble(1))
    assert(math.abs(ranks.sum - 1.0) < 1e-6, s"ranks sum to ${ranks.sum}")
    assert(ranks.forall(_ > 0))
    val again = PageRank.queries("pagerank_trade_graph")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val first = PageRank.queries("pagerank_trade_graph")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(again === first)
  }

  test("high-degree nodes outrank low-degree nodes on average") {
    val deg = PageRank.edges(spark, sf).groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = PageRank.queries("pagerank_trade_graph")(spark, sf)
      .collect().map(_.getString(0))
    val avgTopDeg = top.map(deg).sum.toDouble / top.length
    val avgDeg = deg.values.sum.toDouble / deg.size
    assert(avgTopDeg > avgDeg, s"top-ranked avg degree $avgTopDeg <= global $avgDeg")
  }
}
