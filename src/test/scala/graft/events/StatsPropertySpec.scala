package graft.events

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-random property tests for the factored statistics cores. The
  * fixture's near-uniform counts and dense day series leave the two
  * hardest code paths — Pareto tie-slicing at the p% boundary and ACF
  * pairing across day gaps — barely exercised; these drive them with
  * adversarial synthetic inputs and demand bit equality against direct
  * driver-side computation. */
class StatsPropertySpec extends SparkSpec {

  test("pareto walk: tie-heavy random counts equal the sorted top-k sum") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      // few distinct count values over many users ⇒ every p% boundary
      // lands inside a tie group, the pro-rata slice is always active
      val counts = Seq.fill(307)(1L + rnd.nextInt(4).toLong)
      val perUser = counts.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("user_id", "c")
      val rows = JourneyQueries.paretoFromCounts(spark, perUser)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val sorted = counts.sortBy(-_)
      val total = counts.sum
      assert(rows.map(_._1).toSeq === Seq(1L, 5L, 10L, 25L, 50L), s"seed $seed")
      for ((pct, k, top, share) <- rows) {
        assert(k === math.max(1L, counts.size.toLong * pct / 100L))
        assert(top === sorted.take(k.toInt).sum,
          s"seed $seed pct $pct: boundary slice differs from direct top-k")
        assert(share === top.toDouble / total.toDouble)
      }
    }
  }

  test("acf: gappy random series equals the exact pair-restricted moments") {
    import spark.implicits._
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      // ~35% of days missing ⇒ every lag has a different (and strict)
      // pair subset; values spread two decades to stress the moments
      val series = (0L until 120L)
        .filter(_ => rnd.nextDouble() > 0.35)
        .map(day => day -> (1L + rnd.nextInt(900).toLong))
      val d = series.toDF("day", "x")
      val rows = TrendQueries.acfFromDaily(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val m = series.toMap
      val n = m.size.toLong
      val s1 = m.values.sum
      val s2 = m.values.map(x => x * x).sum
      val den = n * n * s2 - n * s1 * s1
      assert(rows.map(_._1).toSeq ===
        (1L to TrendQueries.MaxAcfLag.toLong), s"seed $seed")
      for ((lag, nPairs, acf) <- rows) {
        val pairs = m.toSeq.flatMap { case (day, x) =>
          m.get(day + lag).map(y => (x, y))
        }
        assert(nPairs === pairs.size.toLong, s"seed $seed lag $lag")
        assert(nPairs < n - lag + 1,
          s"seed $seed lag $lag: gaps must actually restrict the pairs")
        val num = n * n * pairs.map { case (x, y) => x * y }.sum -
          n * s1 * (pairs.map(_._1).sum + pairs.map(_._2).sum) +
          nPairs * s1 * s1
        assert(acf === num.toDouble / den.toDouble,
          s"seed $seed lag $lag: acf differs on the gappy series")
      }
    }
  }
}
