package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupQueries

/** Conservation laws for the curation sweeps — invariants that hold on
  * ANY corpus, independent of the fixture's particular values. */
class SweepSpec extends SparkSpec {

  test("quality sweep: histogram conserves the corpus; cum is the suffix sum") {
    val rows = SweepQueries.queries("corpus_quality_sweep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum === nDocs, "histogram loses or invents docs")
    // rows are qbin-ascending; cum_* must be the suffix sums
    val sufDocs = rows.map(_._2).scanRight(0L)(_ + _).dropRight(1)
    val sufToks = rows.map(_._3).scanRight(0L)(_ + _).dropRight(1)
    assert(rows.map(_._4).toSeq === sufDocs.toSeq, "cum_docs != suffix sum")
    assert(rows.map(_._5).toSeq === sufToks.toSeq, "cum_tokens != suffix sum")
    // the loosest cutoff keeps everything
    assert(rows.head._6 === 1.0 && rows.head._7 === 1.0,
      "lowest bin's share must be exactly 1.0")
    // shares are the exact ratios of the integer columns
    val totToks = rows.map(_._3).sum
    rows.foreach { case (qb, _, _, cd, ct, ds, ts) =>
      assert(ds === cd.toDouble / nDocs.toDouble, s"doc_share off at bin $qb")
      assert(ts === ct.toDouble / totToks.toDouble, s"token_share off at bin $qb")
    }
  }

  test("dup flow: conserves the pair count and orders every source pair") {
    val flow = SweepQueries.queries("corpus_dup_flow")(spark, sf).collect()
    val nPairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf).count()
    assert(flow.map(_.getLong(2)).sum === nPairs,
      "matrix must attribute every near-dup pair exactly once")
    flow.foreach { r =>
      assert(r.getString(0) <= r.getString(1),
        s"unordered cell (${r.getString(0)}, ${r.getString(1)})")
      assert(r.getLong(2) >= 1)
    }
  }

  test("cap ledger: pair algebra exact; kept pairs bound the candidate set") {
    val rows = DedupQueries.queries("dedup_cap_ledger")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, n, pairs, capped, _, _) =>
      assert(pairs === n * (k * (k - 1) / 2), s"k=$k: pair algebra")
      assert(capped === (k > DedupQueries.MaxPosting))
    }
    val keptShare = rows.map(_._6).distinct
    assert(keptShare.length === 1, "kept_share is a constant column")
    // the SUM of kept per-bucket pairs upper-bounds the DISTINCT pair
    // count the chain actually scores (a pair sharing m shingles is
    // counted m times here, deduped there)
    val keptPairs = rows.filter(!_._4).map(_._3).sum
    val actual = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .count()
    assert(actual <= keptPairs,
      "scored pairs cannot exceed the kept posting-pair budget")
  }

  test("threshold sweep: suffix-cumulative and consistent with the 0.5 cut") {
    val rows = DedupQueries.queries("dedup_threshold_sweep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val suf = rows.map(_._2).scanRight(0L)(_ + _).dropRight(1)
    assert(rows.map(_._3).toSeq === suf.toSeq, "cum_pairs != suffix sum")
    // bins ≥ 5 are exactly the pairs the production threshold confirms
    val ge5 = rows.filter(_._1 >= 5L).map(_._2).sum
    val confirmed = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .count()
    assert(ge5 === confirmed,
      "histogram tail must reproduce the JaccardThreshold=0.5 pair count")
    assert(rows.head._4 === 1.0, "lowest bin's share must be exactly 1.0")
  }

  test("charclass simpson: classes partition chars; score bounded by 3/4") {
    val rows = TextQueries.queries("text_charclass_simpson")(spark, sf)
      .collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong === nDocs, "one row per document")
    rows.foreach { r =>
      val (n, a, d, sp, o) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(a + d + sp + o === n, s"doc ${r.getLong(0)}: classes must partition")
      if (n > 0) {
        val simpson = r.getDouble(6)
        assert(simpson >= 0.0 && simpson <= 0.75,
          s"doc ${r.getLong(0)}: 4-class Simpson must be in [0, 3/4], got $simpson")
      } else assert(r.isNullAt(6))
    }
  }

  test("shard plan: deal is balanced, conserves tokens, imbalance exact") {
    val rows = SweepQueries.queries("corpus_shard_plan")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length.toLong === SweepQueries.OutShards)
    val totTok = spark.read.parquet(s"$sf/documents.parquet")
      .select(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(rows.map(_._3).sum === totTok, "plan must conserve corpus tokens")
    // round-robin law: doc counts differ by at most 1 across shards
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1,
      "round-robin deal must balance doc counts within 1")
    val imb = rows.map(_._5).distinct
    assert(imb.length === 1 &&
      imb.head === rows.map(_._3).max.toDouble * SweepQueries.OutShards /
        totTok.toDouble)
    assert(imb.head >= 1.0, "max shard cannot sit below the mean")
    // the size-ranked deal should beat a 1.5x imbalance on any corpus
    // whose whale docs are rank-separated (conservative bound)
    assert(imb.head < 1.5, s"deal imbalance ${imb.head} suspiciously high")
  }

  test("ks: ECDF distance bounded, totals conserve the purchase count") {
    val r = graft.events.CohortQueries
      .queries("events_ks_values")(spark, sf).head()
    val (nA, nB, d, crit) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val purchases = graft.events.EventsQueries.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(nA + nB === purchases, "arm histograms must conserve purchases")
    assert(d >= 0.0 && d <= 1.0, s"KS distance $d outside [0,1]")
    assert(crit === 1.358 * math.sqrt((nA + nB).toDouble / (nA * nB).toDouble))
    assert(r.getBoolean(4) === (d > crit))
  }

  test("modularity: degrees sum to 2m, Σq in [-1,1], rows exact rationals") {
    val rows = graft.graph.GraphXAnalytics
      .queries("graph_source_modularity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === 2 * m, "handshake: Σdeg = 2m")
    assert(rows.map(_.getLong(2)).sum <= m, "intra edges cannot exceed m")
    rows.foreach { r =>
      val (dg, ei) = (r.getLong(1), r.getLong(2))
      assert(r.getDouble(3) ===
        (4 * m * ei - dg * dg).toDouble / (4 * m * m).toDouble,
        s"${r.getString(0)}: q_contrib is not the exact rational")
    }
    val q = rows.map(_.getDouble(3)).sum
    assert(q >= -1.0 && q <= 1.0, s"global modularity $q outside [-1,1]")
  }

  test("ab conversion: arms partition the users and z matches the formula") {
    val r = graft.events.CohortQueries
      .queries("events_ab_conversion")(spark, sf).head()
    val (nA, convA, nB, convB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = graft.events.EventsQueries.events(spark, sf)
      .select(countDistinct("user_id")).head().getLong(0)
    assert(nA + nB === users, "arms must partition the user set")
    assert(convA <= nA && convB <= nB)
    val pA = convA.toDouble / nA.toDouble
    val pB = convB.toDouble / nB.toDouble
    assert(r.getDouble(4) === pA && r.getDouble(5) === pB)
    assert(r.getDouble(6) === pB - pA)
    val pp = (convA + convB).toDouble / (nA + nB).toDouble
    val se2 = pp * (1.0 - pp) * (1.0 / nA.toDouble + 1.0 / nB.toDouble)
    if (se2 > 0.0)
      assert(r.getDouble(7) === (pB - pA) / math.sqrt(se2),
        "z must be the pooled two-proportion statistic")
    else
      assert(r.isNullAt(7), "degenerate variance must yield NULL z")
  }
}
