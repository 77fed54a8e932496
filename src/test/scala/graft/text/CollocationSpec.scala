package graft.text

import graft.SparkSpec

/** PMI collocations against a direct driver-side recomputation from the
  * raw tokenized corpus — the definition, not the join plan. */
class CollocationSpec extends SparkSpec {

  test("pmi bigrams: top-k lift table equals the textbook computation") {
    val got = CollocationQueries.queries("text_pmi_bigrams")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val toks = docs.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val n1 = uni.values.sum
    val pairs = toks.filter(_.size >= 2)
      .flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n2 = pairs.values.sum
    val expected = pairs.toSeq
      .filter(_._2 >= CollocationQueries.MinPairCount)
      .map { case ((w1, w2), c12) =>
        val (c1x, c1y) = (uni(w1), uni(w2))
        val lift = (c12 * n1).toDouble * n1 / (n2.toDouble * c1x * c1y)
        (w1, w2, c12, c1x, c1y, lift)
      }
      .sortBy(x => (-x._6, x._1, x._2))
      .take(CollocationQueries.TopK)
    assert(got.toSeq == expected)
    assert(got.nonEmpty)
    // observed-over-expected: every reported collocation is enriched
    // (the corpus has planted phrases), and counts respect the cut
    assert(got.forall(_._3 >= CollocationQueries.MinPairCount))
    assert(got.head._6 >= got.last._6)
  }

  test("kneser-ney: fixed-point scores equal the rational replay") {
    val rows = CollocationQueries.queries("text_lm_kneser_ney")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .filter(_._2.size >= 2)
    def splitOf(id: Long): String =
      graft.hash.Fnv1a32.hashString(s"split:$id") % 10 match {
        case 0 => "test"; case 1 => "val"; case _ => "train"
      }
    val bgs = docs.map { case (id, t) =>
      (id, splitOf(id), t.zip(t.drop(1)))
    }
    val train = bgs.filter(_._2 == "train").flatMap(_._3)
    val c12 = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1l = c12.keys.toSeq.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val n1r = c12.keys.toSeq.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val nt = c12.size.toLong
    bgs.filter(_._2 == "val").foreach { case (id, _, pairs) =>
      val scores = pairs.map { bg =>
        val cc1 = c1.getOrElse(bg._1, 0L)
        if (cc1 == 0L) n1r.getOrElse(bg._2, 0L) * 1048576L / nt
        else (math.max(4 * c12.getOrElse(bg, 0L) - 3, 0L) * nt +
          3 * n1l.getOrElse(bg._1, 0L) * n1r.getOrElse(bg._2, 0L)) *
          1048576L / (4 * cc1 * nt)
      }
      val oov = pairs.count(bg => !c12.contains(bg)).toLong
      val r = rows.find(_._1 == id).get
      assert(r._2 == pairs.size.toLong)
      assert(r._3 == scores.sum, s"doc $id fixed-point sum")
      assert(r._4 == oov)
      assert(r._5 == scores.sum.toDouble / (pairs.size.toLong * 1048576L))
    }
    // KN mass sanity: every mean probability is a probability
    assert(rows.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
  }
}
