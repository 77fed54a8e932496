package graft.events

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-exact replications of the robust-statistics queries: the ACF and
  * MAD results are recomputed in plain Scala (exact Long arithmetic,
  * identical trailing double ops) from the same daily counts, and must
  * match the distributed result to the last bit — the same contract the
  * DuckDB oracle enforces, but provable inside sbt test. */
class RobustStatsSpec extends SparkSpec {

  private def dailyTotals: Map[Long, Long] =
    EventsQueries.events(spark, sf)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("day").agg(count(lit(1)).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("acf: bit-equal to the exact integer-moment replication") {
    val got = TrendQueries.queries("events_acf_daily")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === (1L to TrendQueries.MaxAcfLag.toLong),
      "one row per lag, ordered")
    val d = dailyTotals
    val n = d.size.toLong
    val s1 = d.values.sum
    val s2 = d.values.map(x => x * x).sum
    val den = n * n * s2 - n * s1 * s1
    for ((lag, nPairs, acf) <- got) {
      val pairs = d.toSeq.flatMap { case (day, x) =>
        d.get(day + lag).map(y => (x, y))
      }
      assert(pairs.size.toLong === nPairs, s"lag $lag pair count")
      val sxy = pairs.map { case (x, y) => x * y }.sum
      val sa = pairs.map(_._1).sum
      val sb = pairs.map(_._2).sum
      val num = n * n * sxy - n * s1 * (sa + sb) + nPairs * s1 * s1
      assert(acf === num.toDouble / den.toDouble,
        s"lag $lag acf differs from the exact replication")
    }
  }

  test("mad outliers: medians bit-equal to a direct sort; flags consistent") {
    val rows = TrendQueries.queries("events_mad_outliers")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      val counts = g.map(_._3.toDouble)
      val med = medOf(counts)
      val mad = medOf(g.map(r => math.abs(r._3 - med)))
      g.foreach { case (_, day, n, gmed, gmad, flag) =>
        assert(gmed === med && gmad === mad,
          s"$tpe day $day: med/mad differ from the direct sort")
        val expect = n > med + TrendQueries.MadK * mad ||
          n < med - TrendQueries.MadK * mad
        assert(flag === expect, s"$tpe day $day: flag inconsistent")
      }
      // robustness sanity: at most half the days can be flagged (the
      // defining advantage of MAD over z-scores)
      val flagged = g.count(_._6)
      assert(flagged * 2 <= g.size,
        s"$tpe: $flagged of ${g.size} days flagged — MAD cannot do that")
    }
  }
}
