package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact replications of the token-distribution diagnostics: frequencies
  * and Gini are recomputed in plain Scala from the same space-split
  * tokens and must match bit-for-bit. */
class DistributionSpec extends SparkSpec {

  private def wordRows: Seq[(String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("zipf head: replays the exact top-64 and its cumulative share") {
    val rows = DistributionQueries.queries("text_zipf_head")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq ===
      (1L to math.min(DistributionQueries.ZipfHead, rows.size).toLong),
      "ranks must be 1..head with no holes")
    val freq = wordRows.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val total = freq.values.sum
    val expect = freq.toSeq.sortBy { case (w, f) => (-f, w) }
      .take(DistributionQueries.ZipfHead)
    assert(rows.map(r => (r._2, r._3)).toSeq === expect,
      "head tokens/frequencies differ from the direct count")
    var cum = 0L
    for ((rank, _, f, rxf, share) <- rows) {
      cum += f
      assert(rxf === rank * f)
      assert(share === cum.toDouble / total.toDouble,
        s"rank $rank: cum_share is not the exact ratio")
    }
    // frequencies non-increasing down the head
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._3 >= b._3
      case _           => true
    })
  }

  test("gini: bit-equal to the closed form over sorted frequencies") {
    val rows = DistributionQueries.queries("text_token_gini")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val bySource = wordRows.groupBy(_._1)
    assert(rows.map(_._1).toSet === bySource.keySet)
    for ((source, vocab, mass, gini) <- rows) {
      val freqs = bySource(source).groupBy(_._2).values
        .map(_.size.toLong).toSeq.sorted
      assert(vocab === freqs.size.toLong && mass === freqs.sum)
      val iwsum = freqs.zipWithIndex
        .map { case (f, i) => (i + 1L) * f }.sum
      val expect = (2L * iwsum - (vocab + 1L) * mass).toDouble /
        (vocab * mass).toDouble
      assert(gini === expect, s"$source: gini differs from the closed form")
      assert(gini >= 0.0 && gini < 1.0, s"$source: gini $gini out of range")
    }
  }
}
