package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("exact dedup: corpus has no exact duplicates, operator reports it") {
    val r = DedupQueries.queries("dedup_exact")(spark, sf).first()
    assert(r.getLong(0) === r.getLong(1)) // n_docs == n_distinct
    assert(r.getLong(2) === 0L)
  }

  test("top ngrams: bounded doc-freq, descending, TakeOrdered plan") {
    val df = DedupQueries.queries("corpus_top_ngrams")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1000))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= DedupQueries.TopNgrams)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.foreach { case (sh, f) =>
      assert(sh.split(" ").length === 3)
      assert(f >= 1 && f <= nDocs) // per-doc distinct ⇒ doc frequency
    }
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sortBy(-_))
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

  test("lsh recall audit: counts reconcile with the two paths it compares") {
    val r = DedupQueries.queries("dedup_lsh_recall_audit")(spark, sf).first()
    val (nExact, nCand, nVer, nCommon) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf).count()
    val lsh = DedupQueries.queries("dedup_minhash_lsh")(spark, sf).count()
    assert(nExact === exact && nVer === lsh)
    // set identities: the diffs are the counts minus the intersection
    assert(r.getLong(4) === nVer - nCommon)   // n_lsh_only
    assert(r.getLong(5) === nExact - nCommon) // n_exact_only
    assert(nCommon <= math.min(nExact, nVer))
    // FIXTURE PIN (not a code invariant): on the current corpus banding
    // emits candidates the verify rejects, so precision is a real
    // measurement, not vacuously 1. A regenerated corpus where every band
    // candidate verifies would flip this to ==; re-derive on regeneration.
    assert(nCand > nVer, s"cand=$nCand verified=$nVer (fixture pin)")
    // true invariants: the audit's ratios are exactly these quotients
    assert(r.getDouble(6) === nCommon.toDouble / nExact)       // recall
    assert(r.getDouble(7) === nVer.toDouble / nCand)           // precision
    // FIXTURE PIN: the set-equality test above pins lsh === exact at this
    // SF and MaxPosting cap, so the audit must agree — recall exactly 1,
    // no one-sided leftovers. Under a skewed corpus or a tighter cap the
    // expectation is recall >= the measured skew-fixture floor (see
    // LshSkewSpec), not exactly 1; re-derive on regeneration.
    assert(r.getDouble(6) === 1.0 && r.getLong(4) === 0L && r.getLong(5) === 0L)
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

  test("64-bit simhash: 16-bit chunk space de-saturates the 8-bit buckets") {
    // the scale claim behind dedup_simhash64_pairs: pigeonhole pair cost
    // is Σ bucket², so the 256×-larger chunk space must show (a) more
    // distinct occupied buckets and (b) a smaller worst bucket
    def buckets(sigs: org.apache.spark.sql.DataFrame, sigCol: String,
        bits: Int, mask: Int) =
      sigs.select(col(sigCol), explode(sequence(lit(0), lit(3))).as("c"))
        .select(expr(s"shiftright($sigCol, CAST($bits * c AS INT)) & $mask")
          .as("chunk"), col("c"))
        .groupBy("c", "chunk").count()
    val b32 = buckets(DedupQueries.queries("dedup_simhash")(spark, sf),
      "simhash", 8, 255)
    val b64 = buckets(DedupQueries.simhash64Sigs(spark, sf),
      "simhash64", 16, 65535)
    val (n32, max32) = (b32.count(), b32.agg(max("count")).first().getLong(0))
    val (n64, max64) = (b64.count(), b64.agg(max("count")).first().getLong(0))
    assert(n64 > n32, s"occupied buckets: 64-bit $n64 vs 32-bit $n32")
    assert(max64 < max32, s"worst bucket: 64-bit $max64 vs 32-bit $max32")
  }

  test("64-bit pairs are a strict-precision subset of the 32-bit pairs") {
    // the low 32 bits of simhash64 ARE simhash32 (same h1 contributions),
    // so hamming64(a,b) >= hamming32(a,b): every 64-bit pair must also be
    // a 32-bit pair — the 64-bit variant trades recall at the same
    // threshold for a bucket space that stays sub-quadratic at corpus
    // scale. (The signature low-word identity is asserted directly too.)
    val low32 = DedupQueries.simhash64Sigs(spark, sf)
      .select(col("doc_id"), expr("simhash64 & 4294967295").as("lo"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sig32 = DedupQueries.queries("dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(low32 === sig32)
    val p64 = DedupQueries.queries("dedup_simhash64_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p32 = DedupQueries.queries("dedup_simhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p64.nonEmpty)
    assert((p64 -- p32).isEmpty, s"not a subset: ${(p64 -- p32).take(5)}")
  }

  test("minhash estimator: quantized to 1/16ths, unbiased within 2 sigma") {
    val rows = DedupQueries.queries("dedup_minhash_estimate")(spark, sf)
      .collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (jac, est, err) =>
      assert(est >= 0.0 && est <= 1.0)
      // each estimate is (#matching components)/16 exactly
      assert((est * 16).round / 16.0 === est)
      assert(math.abs(err - math.abs(est - jac)) < 1e-15)
    }
    // per-component match probability IS the Jaccard, so the mean error
    // over pairs should sit within ~2 standard errors of the per-pair
    // sigma sqrt(J(1-J)/16) ≈ 0.12 at J ≈ 0.5
    val meanErr = rows.map(_._3).sum / rows.length
    assert(meanErr < 0.25, s"estimator biased: mean |err| = $meanErr")
  }

  test("incremental LSH probe equals the full dedup's new-vs-index slice") {
    val inc = DedupQueries.queries("dedup_lsh_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(inc.nonEmpty)
    inc.foreach { case (n, i, j) =>
      assert(n % 10 === 0 && (i % 10) != 0, "strictly new-vs-index pairs")
      assert(j >= DedupQueries.JaccardThreshold)
    }
    // canonicalized, the probe's pairs ARE the full-corpus dedup's pairs
    // with exactly one new-batch side: the full variant's [2, MaxPosting]
    // bucket window implies the index-side ≤ MaxPosting cap, so full ⊆
    // incremental always; the reverse holds whenever no bucket crosses
    // the cap between the two slicings (true on this corpus)
    val full = DedupQueries.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => if (a % 10 == 0) (a, b) else (b, a) }.toSet
    assert(inc.map(p => (p._1, p._2)).toSet === full)
  }

  test("substring spans: every doc reported, coverage bounded, dups covered") {
    val rows = DedupQueries.queries("dedup_substring_spans")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length === nDocs) // left join: clean docs report 0, not absence
    rows.foreach { case (_, nTok, dup, frac) =>
      assert(dup >= 0 && dup <= nTok)
      assert(math.abs(frac - dup.toDouble / nTok) === 0.0)
    }
    // span coverage subsumes whole-doc near-dup: a Jaccard >= 0.5 pair on
    // word-3-gram shingles always shares at least one 8-token run on this
    // corpus, so every pair member must show duplicated spans
    val covered = rows.filter(_._3 > 0).map(_._1).toSet
    assert(covered.nonEmpty)
    val pairDocs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairDocs.subsetOf(covered),
      s"near-dup docs without span coverage: ${pairDocs -- covered}")
  }

  test("edit distance: banded levenshtein over LSH candidates, DP-verified") {
    val rows = DedupQueries.queries("dedup_edit_distance")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "planted near-dups must survive the edit filter")
    rows.foreach { case (a, b, d, sim) =>
      assert(a < b, "canonical pair order")
      assert(d >= 0 && d <= DedupQueries.EditMaxDist)
      assert(sim > 0.0 && sim <= 1.0)
    }
    // independent full-DP verification: Spark's banded levenshtein must
    // equal the classic O(n·m) table on the same prefixes
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(x: String, y: String): Int = {
      var pr = Array.tabulate(y.length + 1)(identity)
      for (i <- 1 to x.length) {
        val cur = new Array[Int](y.length + 1)
        cur(0) = i
        for (j <- 1 to y.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, pr(j) + 1),
            pr(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        pr = cur
      }
      pr(y.length)
    }
    rows.take(8).foreach { case (a, b, d, sim) =>
      val pa = docs(a).take(DedupQueries.EditPrefix)
      val pb = docs(b).take(DedupQueries.EditPrefix)
      assert(d === lev(pa, pb).toLong, s"pair ($a,$b)")
      assert(sim === 1.0 - d.toDouble / math.max(pa.length, pb.length))
    }
  }

  test("containment: dominates jaccard and covers every jaccard dup pair") {
    val rows = DedupQueries.queries("dedup_containment")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, shared, na, nb, ca, cb) =>
      assert(a < b && shared >= 1 && shared <= math.min(na, nb),
        s"($a,$b): overlap exceeds a set size")
      // the emitted doubles are the exact divisions of the integer columns
      assert(ca === shared.toDouble / na && cb === shared.toDouble / nb)
      assert(math.max(ca, cb) >= DedupQueries.ContainmentThreshold)
      // containment >= jaccard always (smaller denominator)
      val jac = shared.toDouble / (na + nb - shared)
      assert(ca >= jac - 1e-15 && cb >= jac - 1e-15)
    }
    // J >= 0.5 implies max containment >= 0.5: the symmetric dup set is
    // a subset of the asymmetric one — containment only widens the net
    val jacPairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val contPairs = rows.map(r => (r._1, r._2)).toSet
    assert(jacPairs.subsetOf(contPairs),
      s"missing jaccard pairs: ${(jacPairs -- contPairs).take(5)}")
    assert(contPairs.size >= jacPairs.size)
  }
}
