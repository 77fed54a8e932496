package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1024
  private val K = 3

  /** Driver-side reference filter — same hash, same mix, same layout. */
  private def refBits(items: Seq[String]): Array[Long] = {
    val bf = new Array[Long](M / 64)
    for (it <- items; i <- 0 until K) {
      val bit = (BloomBits.mix(Fnv1a32.hashString(s"$it:$i")) % M).toInt
      bf(bit >> 6) |= 1L << (bit & 63)
    }
    bf
  }

  private def sparkBits(items: Seq[String], parts: Int): Array[Long] =
    items.toDF("v").repartition(parts)
      .agg(BloomBits.bloomBits(col("v"), M, K))
      .first().getSeq[Long](0).toArray

  test("filter equals a driver-side reference and is partition-invariant") {
    val items = (1 to 500).map(i => s"member$i")
    val ref = refBits(items)
    assert(sparkBits(items, 1) === ref)
    assert(sparkBits(items, 13) === ref,
      "OR-merge must be associative/commutative: same bits at any partitioning")
  }

  test("no false negatives; false-positive rate near the analytic value") {
    val members = (1 to 200).map(i => s"in$i")
    val bf = members.toDF("v")
      .agg(BloomBits.bloomBits(col("v"), M, K).as("bf"))
    val memberHits = members.toDF("v").crossJoin(bf)
      .select(BloomBits.mightContain(col("bf"), col("v"), M, K))
      .collect().map(_.getBoolean(0))
    assert(memberHits.forall(identity), "a bloom filter never misses a member")

    val outsiders = (1 to 2000).map(i => s"out$i")
    val fp = outsiders.toDF("v").crossJoin(bf)
      .select(BloomBits.mightContain(col("bf"), col("v"), M, K))
      .collect().count(_.getBoolean(0))
    // analytic FPR = (1 - e^{-kn/m})^k ≈ 0.089 for n=200, m=1024, k=3;
    // allow wide slack — the law under test is "rare, not absent"
    val rate = fp.toDouble / outsiders.size
    assert(rate > 0.0 && rate < 0.25, s"FPR $rate far from analytic ~0.09")
  }

  test("probe matches a driver-side bit check item by item") {
    val members = (1 to 100).map(i => s"m$i")
    val ref = refBits(members)
    def refContains(it: String): Boolean = (0 until K).forall { i =>
      val bit = (BloomBits.mix(Fnv1a32.hashString(s"$it:$i")) % M).toInt
      (ref(bit >> 6) >> (bit & 63) & 1L) == 1L
    }
    val bf = members.toDF("v")
      .agg(BloomBits.bloomBits(col("v"), M, K).as("bf"))
    val probes = (1 to 300).map(i => s"p$i") ++ members
    val got = probes.toDF("v").crossJoin(bf)
      .select(col("v"), BloomBits.mightContain(col("bf"), col("v"), M, K))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      assert(got(p) === refContains(p), s"probe mismatch for $p")
    }
  }
}
