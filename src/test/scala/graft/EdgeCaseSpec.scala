package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupComponents
import graft.relational.Salting
import graft.sketch.{BloomBits, CmsCounts, KmvDistinct}

/** Empty-input and degenerate-input laws: at 100 TB a sub-pipeline
  * routinely sees an empty slice (a day with no events, a language with no
  * docs, a dedup pass with no pairs) — every operator must degrade to an
  * empty or identity result, never throw.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def noEdges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")

  test("components and BFS of an empty edge list are empty") {
    assert(DedupComponents.components(noEdges).count() === 0)
    assert(DedupComponents.bfsFromCanonicals(noEdges).count() === 0)
  }

  test("salted join with an empty small side is empty, not an error") {
    val big = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val small = Seq.empty[(Long, String)].toDF("k", "w")
    assert(Salting.saltedJoin(big, small, Seq("k"), 8).count() === 0)
    // and left-joining keeps the big side intact
    assert(Salting.saltedJoin(big, small, Seq("k"), 8, "left")
      .count() === 2)
  }

  test("sketch aggregates over zero rows yield their empty states") {
    val empty = Seq.empty[String].toDF("v")
    val kmv = empty
      .agg(KmvDistinct.kmvDistinct(graft.hash.Fnv1a32.fnv1a32(col("v")), 16))
      .first().getDouble(0)
    assert(kmv === 0.0, "KMV of nothing estimates zero distinct")
    val cms = empty.agg(CmsCounts.cmsCounts(col("v"), 3, 32))
      .first().getSeq[Long](0)
    assert(cms.forall(_ === 0L) && cms.length === 96)
    val bloom = empty.agg(BloomBits.bloomBits(col("v"), 256, 3))
      .first().getSeq[Long](0)
    assert(bloom.forall(_ === 0L) && bloom.length === 4)
  }

  test("ranged layout routes supplementary-plane keys by byte order") {
    // UTF-16 String comparison sorts a surrogate pair BELOW U+FFFF while
    // UTF-8 bytes sort it above — a String-ordered router would compute
    // an empty directory interval here and silently drop the emoji key
    val dir = java.nio.file.Files.createTempDirectory("graft_uni").toString
    try {
      val data = Seq(("a", "v", 0L), ("￿", "v", 0L),
        ("😀", "v", 0L)).toDF("key", "value", "shard_id")
      val bounds = Seq("￿")
      graft.keyspace.PartitionedLayout.writeRanged(data, dir, bounds)
      val got = graft.keyspace.PartitionedLayout
        .rangeScan(spark, dir, "￿", "􏿿", bounds)
        .collect().map(_.getString(0))
      assert(got.toSet === Set("￿", "😀"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("sketch aggregates skip null inputs") {
    val mixed = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val cms = mixed.agg(CmsCounts.cmsCounts(col("v"), 3, 32))
      .first().getSeq[Long](0)
    assert(cms.sum === 3L * 2, "two non-null items, depth rows each")
    val bloom = mixed.agg(BloomBits.bloomBits(col("v"), 256, 3))
      .first().getSeq[Long](0)
    val only = Seq("a", "b").toDF("v")
      .agg(BloomBits.bloomBits(col("v"), 256, 3)).first().getSeq[Long](0)
    assert(bloom === only, "nulls must not set bits")
  }
}
