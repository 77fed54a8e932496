package graft.text

import org.apache.spark.sql.functions.{col, size, split, sum}

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("cleaning cascade partitions the corpus exactly") {
    val verdicts = PipelineQueries.queries("corpus_clean_pipeline")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(verdicts.values.sum === total)
    assert(verdicts.contains("kept") && verdicts("kept") > 0)
    assert(verdicts.getOrElse("near_dup", 0L) > 0, "planted dups must drop")
  }

  test("sequence packing matches a driver-side greedy layout per shard") {
    import graft.hash.Fnv1a32
    val L = PipelineQueries.SeqLen
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    val expected = docs
      .groupBy { case (id, _) =>
        Fnv1a32.hashString(s"pack:$id") % PipelineQueries.PackShards }
      .map { case (shard, ds) =>
        val sorted = ds.sortBy(_._1)
        val offs = sorted.map(_._2).scanLeft(0L)(_ + _)
        val total = offs.last
        val straddlers = sorted.indices.count { i =>
          offs(i) / L != (offs(i + 1) - 1) / L }
        val nSeqs = (total + L - 1) / L
        shard -> ((sorted.length.toLong, total, straddlers.toLong, nSeqs,
          total.toDouble / (nSeqs * L)))
      }
    val got = PipelineQueries.queries("corpus_pack_stats")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (shard, e) => assert(got(shard) === e, s"shard $shard") }
  }

  test("contamination: overlap laws hold and benchmark docs are excluded") {
    val rows = PipelineQueries.queries("corpus_contamination")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty, "some corpus doc must share a shingle with bench")
    rows.foreach { case (docId, nSh, nOverlap, frac, contaminated) =>
      assert(docId >= PipelineQueries.BenchDocs)
      assert(nOverlap >= 1 && nOverlap <= nSh)
      assert(frac === nOverlap.toDouble / nSh)
      assert(contaminated === (frac >= PipelineQueries.ContaminationFrac))
    }
  }

  test("balanced mix: per-lang cap honored, exact hash-minimal selection") {
    import graft.hash.Fnv1a32
    val rows = PipelineQueries.queries("corpus_balanced_mix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nTotal, nKept, _) =>
      assert(nKept === math.min(nTotal, PipelineQueries.MixCap.toLong))
    }
    // the kept set must be exactly the MixCap hash-smallest docs per lang
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).map { case (lang, ds) =>
      lang -> ds.map(_._1)
        .sortBy(id => (Fnv1a32.hashString(s"mix:$id"), id))
        .take(PipelineQueries.MixCap).sum
    }
    rows.foreach { case (lang, _, _, keptSum) =>
      assert(keptSum === expected(lang), s"selection differs for $lang")
    }
  }

  test("hash sampling is deterministic and near the target rate") {
    val a = PipelineQueries.queries("corpus_hash_sample")(spark, sf).collect()
    val b = PipelineQueries.queries("corpus_hash_sample")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val (n, sampled) = (a.map(_.getLong(1)).sum, a.map(_.getLong(2)).sum)
    val rate = sampled.toDouble / n
    assert(rate > 0.04 && rate < 0.20, s"rate $rate far from 10%")
  }

  test("curation ledger: keep iff no reasons; cascade verdict is derivable") {
    val ledger = PipelineQueries.queries("corpus_curation_ledger")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(ledger.size === total)
    ledger.values.foreach { case (reasons, keep) =>
      assert(keep === reasons.isEmpty)
    }
    // the one-verdict cascade must equal the ledger's first cascade-order
    // reason (the cascade does not model benchmark/contamination/PII)
    val cascadeOrder = Seq("low_quality", "wrong_lang", "near_dup")
    val derived = ledger.values.toSeq.map { case (reasons, _) =>
      val rs = reasons.split(",").toSet
      cascadeOrder.find(rs.contains).getOrElse("kept")
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cascade = PipelineQueries.queries("corpus_clean_pipeline")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(derived === cascade,
      s"ledger-derived verdicts $derived != cascade $cascade")
  }

  test("quality quartiles: balanced tiles with monotone bounds per language") {
    val rows = PipelineQueries.queries("corpus_quality_quartiles")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum === total)
    rows.groupBy(_._1).foreach { case (lang, tiles) =>
      assert(tiles.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
      val sizes = tiles.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang tiles unbalanced: $sizes")
      val ordered = tiles.sortBy(_._2)
      ordered.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$lang bounds overlap")
        case _ =>
      }
    }
  }

  test("pack assignment reconciles with the pack stats and is gap-free") {
    val assign = PipelineQueries.queries("corpus_pack_assign")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val stats = PipelineQueries.queries("corpus_pack_stats")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val seqLen = PipelineQueries.SeqLen
    assign.groupBy(_._2).foreach { case (shard, docs) =>
      val (nDocs, nTokens, nStraddlers) = stats(shard)
      assert(docs.length.toLong === nDocs)
      assert(docs.map(_._3).sum === nTokens)
      // straddlers: first and last sequence differ
      assert(docs.count(d => d._5 != d._6).toLong === nStraddlers)
      // the layout is gap-free: offsets in doc order tile the shard
      val inOrder = docs.sortBy(_._1)
      inOrder.foldLeft(0L) { case (expectedOff, d) =>
        assert(d._4 === expectedOff, s"gap before doc ${d._1} in shard $shard")
        assert(d._7 === d._4 % seqLen)
        assert(d._5 === d._4 / seqLen)
        expectedOff + d._3
      }
    }
  }

  test("priority sample: size k, descending, priorities recompute exactly") {
    import org.apache.spark.sql.functions._
    import graft.hash.Fnv1a32.fnv1a32
    val rows = PipelineQueries.queries("corpus_priority_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(rows.length === PipelineQueries.SampleK)
    assert(rows.map(_._3).sliding(2).forall(p => p(0) >= p(1)),
      "priorities must be emitted in descending order")
    val byDoc = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        fnv1a32(concat(lit("prio:"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (id, nTok, prio) =>
      val (w, h) = byDoc(id)
      assert(nTok === w)
      assert(prio === (w * 4294967296L).toDouble / (h + 1L).toDouble)
    }
    // the cut is the true top-k: no unsampled doc outranks a sampled one
    val minSampled = rows.map(_._3).min
    val sampledIds = rows.map(_._1).toSet
    byDoc.foreach { case (id, (w, h)) =>
      if (!sampledIds.contains(id))
        assert((w * 4294967296L).toDouble / (h + 1L).toDouble <= minSampled)
    }
  }

  test("stratified quotas: budget met exactly, proportional within one seat") {
    val rows = PipelineQueries.queries("corpus_stratified_quota")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val total = rows.map(_._3).sum
    assert(rows.map(_._4).sum === PipelineQueries.QuotaBudget,
      "largest-remainder must hit the budget exactly")
    rows.foreach { case (_, _, avail, quota) =>
      val exact = PipelineQueries.QuotaBudget.toDouble * avail / total
      assert(quota >= exact.floor.toLong && quota <= exact.floor.toLong + 1,
        s"quota $quota vs exact share $exact")
      assert(quota <= avail, "a quota never exceeds availability here")
    }
  }

  test("stratified draw: exactly the quota per stratum, hash-minimal prefix") {
    import graft.hash.Fnv1a32
    val quotas = PipelineQueries.queries("corpus_stratified_quota")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    val drawn = PipelineQueries.queries("corpus_stratified_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(drawn.length.toLong === PipelineQueries.QuotaBudget,
      "the draw must materialize exactly the budget")
    val byStratum = drawn.groupBy(d => (d._1, d._2))
    byStratum.foreach { case (k, rows) =>
      assert(rows.length.toLong === quotas(k), s"stratum $k draw != quota")
      // ranks are the contiguous prefix 1..quota
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // the draw takes the hash-minimal docs: no undrawn doc in a stratum
    // outranks a drawn one
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def key(id: Long) = (Fnv1a32.hashString(s"draw:$id"), id)
    byStratum.foreach { case ((lang, source), rows) =>
      val drawnIds = rows.map(_._4).toSet
      val worstDrawn = rows.map(d => key(d._4)).max
      docs.filter(d => d._2 == lang && d._3 == source &&
          !drawnIds.contains(d._1))
        .foreach { d =>
          assert(Ordering[(Long, Long)].gt(key(d._1), worstDrawn),
            s"undrawn doc ${d._1} outranks a drawn doc in ($lang, $source)")
        }
    }
  }

  test("global ids: dense 0..n-1, order-isomorphic to doc_id") {
    val rows = PipelineQueries.queries("corpus_global_ids")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).toSet === rows.indices.map(_.toLong).toSet)
    assert(rows.sortBy(_._1).map(_._2).sliding(2).forall(p => p(0) < p(1)))
  }

  test("temperature mix: weights normalized, flatter than raw shares") {
    val rows = PipelineQueries.queries("corpus_temperature_mix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val total = rows.map(_._2).sum.toDouble
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    // α = 1/2 compresses ratios: order is preserved but for n_i > n_j
    // the weight ratio w_i/w_j = sqrt(n_i/n_j) sits strictly below the
    // raw share ratio n_i/n_j — the flattening theorem itself
    for (Seq((_, ni, wi, _), (_, nj, wj, _)) <- rows.sortBy(-_._2)
        .toSeq.combinations(2)) {
      if (ni > nj) {
        assert(wi > wj)
        assert(wi / wj < ni.toDouble / nj + 1e-9)
        assert(math.abs(wi / wj - math.sqrt(ni.toDouble / nj)) < 1e-4)
      }
    }
    rows.foreach { case (_, n, w, draws) =>
      assert(w > 0 && w < 1 && n > 0)
      // floor of the budget share (associativity of the product may
      // differ from the collected w by an ulp, hence the ±1 envelope)
      assert(draws <= PipelineQueries.MixDraws * w + 1e-6)
      assert(draws > PipelineQueries.MixDraws * w - 1 - 1e-6)
    }
    // floor apportionment never overshoots the budget
    assert(rows.map(_._4).sum <= PipelineQueries.MixDraws)
    assert(rows.map(_._4).sum > PipelineQueries.MixDraws - rows.length)
  }

  test("length buckets: exact partition of the corpus, bounded padding") {
    val rows = PipelineQueries.queries("corpus_length_buckets")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_._2).sum === docs.count())
    val totTok = docs
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).first().getLong(0)
    assert(rows.map(_._3).sum === totTok)
    rows.foreach { case (top, n, toks, pad, frac) =>
      assert(top % 64 === 0 && top > 0)
      assert(pad === n * top - toks)
      assert(pad >= 0 && pad < 64 * n) // every doc pads strictly under 64
      assert(frac === pad.toDouble / (n * top))
    }
  }

  test("dedup savings ledger reconciles with the components verdict") {
    import org.apache.spark.sql.functions.col
    val rows = PipelineQueries.queries("corpus_dedup_savings")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum === total, "sources must cover the corpus")
    val dropped = graft.dedup.DedupComponents
      .queries("dedup_components")(spark, sf)
      .filter(!col("is_canonical")).count()
    assert(rows.map(_._4).sum === dropped,
      "per-source drops must sum to the components verdict")
    rows.foreach { case (_, nDocs, tokTotal, nDrop, tokDrop) =>
      assert(nDrop <= nDocs && tokDrop <= tokTotal)
    }
  }

  test("canonical keep: one best-quality keeper per cluster, same members") {
    import org.apache.spark.sql.functions.col
    val rows = PipelineQueries.queries("corpus_canonical_keep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // membership identical to the components verdict
    val comp = graft.dedup.DedupComponents
      .queries("dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet === comp,
      "canonical-keep must rank exactly the dup-cluster members")
    rows.groupBy(_._1).foreach { case (c, g) =>
      assert(g.size >= 2, s"component $c: a dup cluster has >= 2 members")
      val kept = g.filter(_._4)
      assert(kept.size === 1, s"component $c: exactly one keeper")
      // the keeper is the quality argmax with the min-id tiebreak
      val best = g.minBy { case (_, id, q, _) => (-q, id) }
      assert(kept.head === best, s"component $c: keeper is not the argmax")
    }
    // quality column agrees with text_quality_score for the same docs
    val qmap = TextQueries.queries("text_quality_score")(spark, sf)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (_, id, q, _) =>
      assert(q === qmap(id), s"doc $id: quality drifts from the scorer")
    }
  }

  test("token pareto: bit-equal to sorting docs by length") {
    val rows = PipelineQueries.queries("corpus_token_pareto")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 5L, 10L, 25L, 50L))
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " "))
        .cast("long"))
      .collect().map(_.getLong(0)).sortBy(-_)
    val total = lens.sum
    for ((pct, k, top, share) <- rows) {
      assert(k === math.max(1L, lens.length.toLong * pct / 100L))
      assert(top === lens.take(k.toInt).sum,
        s"$pct%: histogram walk differs from the direct longest-k sum")
      assert(share === top.toDouble / total.toDouble)
    }
    // the longest half can never hold less than half the tokens
    assert(rows.last._4 >= 0.5 - 1e-12)
  }

  test("dedup gain: reconciles keep verdicts; gain is never negative") {
    val gains = PipelineQueries.queries("corpus_dedup_gain")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    val keep = PipelineQueries.queries("corpus_canonical_keep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(gains.map(_._1).toSet === keep.map(_._1).toSet,
      "one gain row per cluster")
    val byComp = keep.groupBy(_._1)
    gains.foreach { case (c, keptDoc, keptQ, minQ, gain, improved) =>
      val g = byComp(c)
      val kept = g.filter(_._4).head
      assert(keptDoc === kept._2 && keptQ === kept._3,
        s"component $c: gain row disagrees with the keep verdict")
      val minid = g.find(_._2 == c).getOrElse(
        fail(s"component $c: the min-id label must be a member"))
      assert(minQ === minid._3)
      assert(gain === keptQ - minQ)
      // the argmax can never do worse than the min-id pick
      assert(gain >= 0.0, s"component $c: negative gain $gain")
      assert(improved === (gain > 0.0))
    }
  }
}
