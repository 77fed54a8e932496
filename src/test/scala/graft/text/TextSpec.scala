package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32

class TextSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("whitespace token count equals the document's word count") {
    val first = docs.orderBy("doc_id").select("doc_id", "text").first()
    val expected = first.getString(1).split("\\s+").length.toLong
    val got = TextQueries.queries("text_token_counts")(spark, sf)
      .filter(col("doc_id") === first.getLong(0)).first().getLong(1)
    assert(got === expected)
  }

  test("fingerprint equals the fnv1a32 kernel on the raw text") {
    val first = docs.orderBy("doc_id").select("doc_id", "text").first()
    val got = TextQueries.queries("text_fingerprint")(spark, sf)
      .filter(col("doc_id") === first.getLong(0)).first().getLong(1)
    assert(got === Fnv1a32.hashString(first.getString(1)))
  }

  test("quality score is bounded and ratios are sane") {
    val rows = TextQueries.queries("text_quality_score")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // quality
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // stop ratio
      assert(r.getDouble(3) > 0.0) // avg token len
    }
  }

  test("language vote is total: every doc gets a prediction") {
    val dist = TextQueries.queries("text_language_dist")(spark, sf).collect()
    assert(dist.map(_.getLong(1)).sum === docs.count())
  }

  test("repetition stats match a driver-side recompute on sample docs") {
    val got = TextQueries.queries("text_repetition_stats")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val sample = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    sample.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val n = toks.length.toLong
      val byTok = toks.groupBy(identity).map(_._2.length.toLong)
      val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val (nTokens, distinctRatio, topFrac, dupFrac) = got(id)
      assert(nTokens === n)
      assert(distinctRatio === byTok.size.toDouble / n)
      assert(topFrac === byTok.max.toDouble / n)
      assert(dupFrac === 1.0 - grams.distinct.size.toDouble / (n - 1))
    }
  }

  test("tfidf keywords: rank law, score law, rarer-term dominance") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val rows = TextQueries.queries("text_tfidf_keywords")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // score is exactly tf * N / df, and df can never exceed the corpus
    rows.foreach { case (_, _, tf, df, score, _) =>
      assert(df >= 1 && df <= n)
      assert(score === tf.toDouble * n.toDouble / df.toDouble)
    }
    // per doc: ranks are 1..k (k ≤ 3) and scores weakly descend with rank
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._6)
      assert(sorted.map(_._6).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_._5).toSeq === sorted.map(_._5).toSeq.sortBy(-_))
    }
  }

  test("chunk spans: full coverage, exact stride, clipped tail — property") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val C = TextQueries.ChunkTokens
    val S = TextQueries.ChunkStride
    // the pure span plan for a doc of n tokens, as the query computes it
    def spans(n: Long): Seq[(Long, Long)] = {
      val chunks = 1 + (math.max(n - C, 0) + S - 1) / S
      (0L until chunks).map(i => (i * S, math.min(i * S + C, n)))
    }
    val prop = Prop.forAll(Gen.chooseNum(0L, 5000L)) { n =>
      val ss = spans(n)
      val coverage = ss.forall { case (a, b) => a <= b } &&
        ss.head._1 == 0 && ss.last._2 == math.max(n, 0) &&
        // consecutive starts are exactly one stride apart, and every
        // token position is inside some span (no gap: next start is
        // before the previous end whenever more than one chunk exists)
        ss.sliding(2).forall {
          case Seq((a1, b1), (a2, _)) => a2 == a1 + S && a2 < b1
          case _ => true
        }
      // only the FIRST chunk of an undersized doc, and the last chunk,
      // may be shorter than C
      val sized = ss.dropRight(1).drop(if (n < C) 1 else 0)
        .forall { case (a, b) => b - a == C }
      coverage && sized
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("chunk spans query ties to the pure plan on every fixture doc") {
    val rows = TextQueries.queries("text_chunk_spans")(spark, sf)
      .groupBy("doc_id")
      .agg(max("end_tok").as("covered"), count("*").as("n_chunks"))
      .join(TextQueries.queries("text_token_counts")(spark, sf)
        .select(col("doc_id"), col("n_ws_tokens")), "doc_id")
    val off = rows.filter(col("covered") =!= col("n_ws_tokens")).count()
    assert(off === 0L, s"$off docs where chunk coverage != token count")
  }

  test("pii flags count planted emails and long digit runs") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pii").toString
    try {
      Seq(
        (1L, "contact bob@example.com or ops@corp.io today", "en", "srsay", 44L),
        (2L, "serial 1234567 and zip 12345 appear here", "en", "srbey", 40L),
        (3L, "a perfectly clean sentence", "en", "srcey", 26L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = TextQueries.queries("text_pii_flags")(spark, dir)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      assert(got(1L) === ((2L, 0L, true)))
      assert(got(2L) === ((0L, 1L, true))) // 5-digit run is below threshold
      assert(got(3L) === ((0L, 0L, false)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("confusion matrix ties out to the corpus and the distribution rollup") {
    val m = TextQueries.queries("text_lang_confusion")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(m.map(_._3).sum === corpus, "every doc lands in one cell")
    // per-verdict column sums ARE the distribution rollup (shared vote)
    val dist = TextQueries.queries("text_language_dist")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val colSums = m.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(colSums === dist)
  }

  test("lm likelihood: scores bounded, fixture docs all covered, repetition ranks high") {
    val rows = TextQueries.queries("text_lm_likelihood")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val nDocs = docs.filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length.toLong === nDocs, "every multi-token doc is scored")
    rows.foreach { case (_, nBg, sumPq, minPq, meanP) =>
      assert(nBg >= 1)
      // every observed transition has probability in (0, 1]
      assert(minPq >= 0 && minPq <= 1048576)
      assert(sumPq >= minPq && sumPq <= nBg * 1048576)
      assert(meanP === sumPq.toDouble / (nBg * 1048576L).toDouble)
    }
  }

  test("lm likelihood: hand-computed model on a three-doc corpus") {
    import spark.implicits._
    val tiny = Seq((0L, "a b a b"), (1L, "a b"), (2L, "a c"))
      .toDF("doc_id", "text")
    val dir = s"${java.nio.file.Files.createTempDirectory("lmtest")}"
    tiny.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // occurrences: doc0 = [a b, b a, a b], doc1 = [a b], doc2 = [a c]
    // c12: (a b)=3, (b a)=1, (a c)=1; c1: a=4, b=1
    // p_q: (a b) = 3*2^20 div 4 = 786432; (b a) = 2^20; (a c) = 262144
    val got = TextQueries.queries("text_lm_likelihood")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 3L, 786432L + 1048576L + 786432L, 786432L),
      (1L, 1L, 786432L, 786432L),
      (2L, 1L, 262144L, 262144L)))
  }

  test("holdout lm: exactly the val split scored, smoothing floors unseen mass") {
    import graft.hash.Fnv1a32
    val rows = TextQueries.queries("text_lm_holdout")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // membership: exactly the MULTI-TOKEN docs the split assigns to
    // 'val' (single-token docs have no bigrams and are filtered the
    // same way the in-corpus LM filters them)
    val valIds = docs.filter(size(split(col("text"), " ")) >= 2)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => Fnv1a32.hashString(s"split:$id") % 10 == 1).toSet
    assert(rows.map(_._1).toSet === valIds)
    rows.foreach { case (_, nBg, sumPq, nUnseen, meanP) =>
      assert(nUnseen >= 0 && nUnseen <= nBg)
      // Laplace smoothing: every transition keeps strictly positive
      // probability, and none exceeds certainty
      assert(sumPq > 0 && sumPq <= nBg * 1048576L)
      assert(meanP === sumPq.toDouble / (nBg * 1048576L).toDouble)
    }
    // the unseen-bigram path needs the bigger corpus to appear (the
    // sf0.001 vocabulary is too small to leave any val transition
    // untrained) — assert it where the driver's gate runs
    val atGate = TextQueries.queries("text_lm_holdout")(
        spark, "/root/testdata/sf0.01")
      .filter(org.apache.spark.sql.functions.col("n_unseen") > 0).count()
    assert(atGate > 0, "sf0.01 must exercise unseen bigrams")
  }

  test("vocab coverage: totals tie to tokenization, rates well-formed") {
    val rows = TextQueries.queries("text_vocab_coverage")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val totalToks = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(rows.map(_._2).sum === totalToks)
    rows.foreach { case (_, n, oov, rate) =>
      assert(oov >= 0 && oov <= n)
      assert(rate === oov.toDouble / n)
    }
  }

  test("BPE pair stats: driver-side recount agrees, ranking deterministic") {
    val got = TextQueries.queries("text_bpe_pair_stats")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.length === TextQueries.BpeTopPairs)
    got.foreach { case (p, n) => assert(p.length === 2 && n >= 1) }
    // reference count over the raw corpus, word-internal adjacent pairs
    val ref = docs.collect()
      .flatMap(_.getAs[String]("text").split(" "))
      .flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, o) => (p, o.length.toLong) }
    val expected = ref.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(TextQueries.BpeTopPairs)
    assert(got.toSeq === expected)
  }

  test("BPE apply: merges the top pair, accounting closes, driver recheck") {
    val r = TextQueries.queries("text_bpe_apply")(spark, sf).first()
    val (pair, before, merges, after, compression) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    val topFromStats = TextQueries.queries("text_bpe_pair_stats")(spark, sf)
      .first().getString(0)
    assert(pair === topFromStats)
    assert(after === before - merges)
    assert(merges > 0 && after > 0)
    assert(compression === after.toDouble / before)
    // driver-side recount: non-overlapping left-to-right merge per word
    val words = docs.collect().flatMap(_.getAs[String]("text").split(" "))
    val refBefore = words.map(_.length.toLong).sum
    val refMerges = words
      .map(w => (w.length - w.replace(pair, "").length).toLong / 2).sum
    assert(before === refBefore)
    assert(merges === refMerges)
  }
}
