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

  test("triangle counts: K4 gives 3 per vertex, a path gives 0, a lone triangle 1") {
    // K4 on {1..4} (every vertex in C(3,2)=3 triangles), path 10-11-12,
    // triangle {20,21,22}
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((10L, 11L), (11L, 12L),
      (20L, 21L), (20L, 22L), (21L, 22L))).toDF("doc_a", "doc_b")
    val got = GraphXAnalytics.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 0L, 11L -> 0L, 12L -> 0L, 20L -> 1L, 21L -> 1L, 22L -> 1L)
    assert(got === expected)
  }
}
