package graft.hash

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.hash.Fnv1a32.{fnv1a32, shardId}

/** Known-answer vectors generated from the FNV-1a definition (offset basis
  * 2166136261, prime 16777619 — public spec; matches the reference's
  * `internal/coordinator/shard_registry.go:372-379`), plus the reference's
  * key-pattern matrix (`features/distributed-storage.feature:106-113`).
  */
class Fnv1aSpec extends SparkSpec {

  val vectors: Seq[(String, Long, Long)] = Seq(
    ("", 2166136261L, 1L),
    ("a", 3826002220L, 0L),
    ("abc", 440920331L, 3L),
    ("order:42", 1226683121L, 1L),
    ("test-key", 2593649543L, 3L),
    ("数字", 3839462415L, 3L), // UTF-8 multi-byte: hashes bytes, not code points
    ("user@example.com", 3718907387L, 3L),
    ("path/to/resource", 3490450999L, 3L),
    ("key-with-spaces here", 3575249729L, 1L),
    ("very:long:key:with:many:colons:and:segments", 2442315202L, 2L))

  test("kernel matches known-answer vectors") {
    for ((s, h, sid) <- vectors) {
      assert(Fnv1a32.hashString(s) === h, s"hash($s)")
      assert(Fnv1a32.hashString(s) % 4 === sid, s"shard($s)")
    }
  }

  test("expression (codegen path) matches kernel on fixture keys") {
    import spark.implicits._
    val df = vectors.map(_._1).toDF("k")
      .select(col("k"), fnv1a32(col("k")).as("h"), shardId(col("k")).as("s"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === vectors)
  }

  test("hash is deterministic, in [0, 2^32), shard in [0, 4)") {
    val prop = Prop.forAll(Gen.asciiPrintableStr) { s: String =>
      val h = Fnv1a32.hashString(s)
      h >= 0L && h < (1L << 32) && h == Fnv1a32.hashString(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("distribution over shards is roughly uniform (chi-squared)") {
    val n = 10000
    val counts = (0 until n).map(i => Fnv1a32.hashString(s"key-$i") % 4)
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = n / 4.0
    val chi2 = counts.values.map(c => math.pow(c - expected, 2) / expected).sum
    // 3 dof, p=0.001 critical value ~16.27
    assert(chi2 < 16.27, s"chi2=$chi2 counts=$counts")
  }
}
