package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("exact dedup: corpus has no exact duplicates, operator reports it") {
    val r = DedupQueries.queries("dedup_exact")(spark, sf).first()
    assert(r.getLong(0) === r.getLong(1)) // n_docs == n_distinct
    assert(r.getLong(2) === 0L)
  }

  test("ngram jaccard finds the planted near-duplicates") {
    val pairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 >= DedupQueries.JaccardThreshold))
    assert(pairs.forall(p => p._1 < p._2), "canonical pair order")
  }

  test("minhash LSH recovers the exact-jaccard pairs on this corpus") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact,
      s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("simhash: near-identical docs hash to near-identical signatures") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val best = exact.maxBy(_._3) // the closest planted pair
    val sims = DedupQueries.queries("dedup_simhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sims.contains((best._1, best._2)),
      s"pair $best should be within hamming ${DedupQueries.HammingMax}")
  }

  test("simhash signatures fit in 32 bits and are deterministic") {
    val sigs = DedupQueries.queries("dedup_simhash")(spark, sf).collect()
    assert(sigs.forall(r => r.getLong(1) >= 0 && r.getLong(1) < (1L << 32)))
    val again = DedupQueries.queries("dedup_simhash")(spark, sf).collect()
    assert(sigs.map(_.getLong(1)).toSeq === again.map(_.getLong(1)).toSeq)
  }
}
