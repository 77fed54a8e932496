package graft.sources

import graft.SparkSpec

/** The persisted-index cache-key contract (ADVICE round 6): the key
  * must change when the corpus changes (staleness) and must separate
  * raw paths that sanitize identically (collision). */
class IndexCacheSpec extends SparkSpec {

  private val base = "target/tmp/idxcache"

  private def write(dir: String, n: Int): Unit = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("sanitized twins (/a/b vs /a_b) get distinct index paths") {
    write(s"$base/a/b", 10)
    write(s"$base/a_b", 10)
    val p1 = IndexCache.path(spark, s"$base/a/b", "ivfpq", "embeddings", "vec_id")
    val p2 = IndexCache.path(spark, s"$base/a_b", "ivfpq", "embeddings", "vec_id")
    assert(p1 != p2, "raw-path FNV must separate sanitized twins")
  }

  test("the corpus fingerprint (rows + max id) is part of the key") {
    write(s"$base/c10", 10)
    write(s"$base/c12", 12)
    val p10 = IndexCache.path(spark, s"$base/c10", "ivfpq", "embeddings", "vec_id")
    val p12 = IndexCache.path(spark, s"$base/c12", "ivfpq", "embeddings", "vec_id")
    // a regenerated corpus with different rows/ids lands on a fresh
    // directory, so a stale index can never be served for it
    assert(p10.endsWith("_10_9"), s"rows+max missing from $p10")
    assert(p12.endsWith("_12_11"), s"rows+max missing from $p12")
  }

  test("the fingerprint is memoized: one corpus read per process") {
    write(s"$base/m", 5)
    val f1 = IndexCache.fingerprint(spark, s"$base/m", "embeddings", "vec_id")
    val f2 = IndexCache.fingerprint(spark, s"$base/m", "embeddings", "vec_id")
    assert(f1 eq f2, "second call must come from the in-process cache")
  }
}
