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

  private def dailyByType: Map[String, Seq[(Long, Long)]] =
    EventsQueries.events(spark, sf)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("weekday chi2: contributions bit-equal to exact integer clearing") {
    val rows = TrendQueries.queries("events_weekday_chi2")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val d = dailyByType
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      val days = d(tpe)
      val dd = days.size.toLong
      val nn = days.map(_._2).sum
      assert(g.map(_._3).sum === dd, s"$tpe: weekday day counts cover D")
      assert(g.map(_._4).sum === nn, s"$tpe: weekday masses cover N")
      g.foreach { case (_, wd, dw, obs, expd, part) =>
        val wdDays = days.filter { case (day, _) => (day + 3) % 7 == wd }
        assert(wdDays.size.toLong === dw && wdDays.map(_._2).sum === obs,
          s"$tpe wd $wd: observed mass differs from the direct count")
        assert(expd === (nn * dw).toDouble / dd.toDouble)
        val sub = obs * dd - nn * dw
        assert(part === sub.toDouble * sub.toDouble /
          (dw * nn * dd).toDouble, s"$tpe wd $wd: chi2 part differs")
      }
    }
  }

  test("bootstrap ci: deterministic resamples replay bit-for-bit") {
    val row = TrendQueries.queries("events_bootstrap_ci")(spark, sf)
      .collect() match {
      case Array(r) => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
      case other => fail(s"expected exactly one row, got ${other.length}")
    }
    val (nDays, b, meanObs, ciLo, ciHi) = row
    assert(b === TrendQueries.BootB)
    val xs = dailyTotals.toSeq.sortBy(_._1).map(_._2)
    assert(nDays === xs.size.toLong)
    assert(meanObs === xs.sum.toDouble / xs.size.toDouble)
    // replay all 200 resamples with the same hash-derived picks
    val n = xs.size
    val means = (0L until TrendQueries.BootB).map { r =>
      var s = 0L
      var j = 0
      while (j < n) {
        s += xs((graft.hash.Fnv1a32.hashString(s"b:$r:$j") % n).toInt)
        j += 1
      }
      (s.toDouble / n.toDouble, r)
    }.sorted
    assert(ciLo === means((TrendQueries.BootLoRank - 1).toInt)._1,
      "ci_lo is not the 5th sorted replica mean")
    assert(ciHi === means((TrendQueries.BootHiRank - 1).toInt)._1,
      "ci_hi is not the 196th sorted replica mean")
    assert(ciLo <= ciHi)
    // the interval should cover the observed mean on any sane corpus
    assert(ciLo <= meanObs && meanObs <= ciHi,
      s"95% CI [$ciLo, $ciHi] misses the observed mean $meanObs")
  }

  test("permutation test: all 100 permuted chi2 replay bit-for-bit") {
    val Array(row) = TrendQueries
      .queries("events_weekday_permtest")(spark, sf).collect()
    val (chi2Obs, b, nGe, p) = (row.getDouble(0), row.getLong(1),
      row.getLong(2), row.getDouble(3))
    assert(b === TrendQueries.PermB)
    val days = dailyTotals.toSeq.sortBy(_._1)
    val dd = days.size.toLong
    val nn = days.map(_._2).sum
    // weekday slot sizes from the true calendar, cumulative in wd order
    val dw = days.groupBy { case (day, _) => (day + 3) % 7 }.view
      .mapValues(_.size.toLong).toMap
    val slotOrder = dw.keys.toSeq.sorted
    def chi2Fold(obs: Map[Long, Long]): Double =
      (0L to 6L).foldLeft(0.0) { (acc, w) =>
        acc + (if (dw.contains(w)) {
          val sub = obs.getOrElse(w, 0L) * dd - nn * dw(w)
          sub.toDouble * sub.toDouble / (dw(w) * nn * dd).toDouble
        } else 0.0)
      }
    val obsByWd = days.groupBy { case (day, _) => (day + 3) % 7 }.view
      .mapValues(_.map(_._2).sum).toMap
    assert(chi2Obs === chi2Fold(obsByWd), "observed chi2 differs")
    // slot position ranges [lo, hi) in wd order
    val bounds = slotOrder.scanLeft(0L) { case (acc, w) => acc + dw(w) }
    val slotOf = slotOrder.zip(bounds.zip(bounds.tail)).toMap
    var countGe = 0L
    for (r <- 0L until TrendQueries.PermB) {
      val ranked = days.sortBy { case (day, _) =>
        (graft.hash.Fnv1a32.hashString(s"p:$r:$day"), day)
      }
      val obs = slotOf.map { case (w, (lo, hi)) =>
        w -> ranked.slice(lo.toInt, hi.toInt).map(_._2).sum
      }
      if (chi2Fold(obs) >= chi2Obs) countGe += 1
    }
    assert(nGe === countGe, "permutation rank count differs")
    assert(p === (countGe + 1).toDouble / (TrendQueries.PermB + 1).toDouble)
    assert(p > 0.0 && p <= 1.0)
  }

  test("mann-kendall: S, variance, and z bit-equal to the O(n²) loop") {
    val rows = TrendQueries.queries("events_trend_mannkendall")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    val d = dailyByType
    assert(rows.map(_._1).toSet === d.keySet.filter(d(_).size >= 2))
    rows.foreach { case (tpe, nDays, sStat, varS, z, hasTrend) =>
      val xs = d(tpe).map(_._2)
      assert(nDays === xs.size.toLong)
      var s = 0L
      for (i <- xs.indices; j <- i + 1 until xs.size)
        s += java.lang.Long.signum(xs(j) - xs(i)).toLong
      assert(sStat === s, s"$tpe: S differs from the pair loop")
      val n = xs.size.toLong
      val tieTerm = xs.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1L) * (2L * t + 5L)).sum
      val expVar = (n * (n - 1L) * (2L * n + 5L) - tieTerm).toDouble / 18.0
      assert(varS === expVar, s"$tpe: variance differs")
      val expZ =
        if (s > 0L) (s - 1L).toDouble / math.sqrt(expVar)
        else if (s < 0L) (s + 1L).toDouble / math.sqrt(expVar)
        else 0.0
      assert(z === expZ, s"$tpe: z differs")
      assert(hasTrend === (math.abs(expZ) > 1.96))
    }
  }
}
