package graft.graph

import graft.SparkSpec
import graft.dedup.DedupComponents

class GraphXSpec extends SparkSpec {
  import spark.implicits._

  test("GraphX components equal the DataFrame label propagation") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L)).toDF("doc_a", "doc_b")
    val df = DedupComponents.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = GraphXAnalytics.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gx === df)
  }
}
