package graft.events

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The window-identity CUSUM and the moment-based OLS against direct
  * driver-side recomputations from the raw daily counts — the recursion
  * and the textbook formulas, not the windows. */
class TrendSpec extends SparkSpec {

  private def dailyCounts: Map[String, Seq[(Long, Long)]] =
    EventsQueries.events(spark, sf)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq).toMap

  test("cusum: window identity equals the textbook recursion exactly") {
    val rows = TrendQueries.queries("events_cusum_shift")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(6)))
      .toMap
    assert(rows.nonEmpty)
    dailyCounts.foreach { case (tpe, series) =>
      val nd = series.length.toLong
      val s = series.map(_._2).sum
      // recursion on the EXACT integer numerators (values × nd), mirroring
      // S+_t = max(0, S+_{t-1} + (x_t - mean)); same for the down side
      var up = 0L
      var down = 0L
      series.foreach { case (day, n) =>
        val y = n * nd - s // (x_t - mean) × nd, exact
        up = math.max(0L, up + y)
        down = math.max(0L, down - y)
        val (gotN, gotUp, gotDown, _) = rows((tpe, day))
        assert(gotN == n)
        assert(gotUp == up.toDouble / nd, s"up($tpe,$day)")
        assert(gotDown == down.toDouble / nd, s"down($tpe,$day)")
      }
    }
    // the flag derives from the reported statistic and σ
    val byType = dailyCounts.map { case (tpe, series) =>
      val nd = series.length
      val s = series.map(_._2).sum
      val sq = series.map(x => x._2 * x._2).sum
      tpe -> math.sqrt((sq.toDouble - s.toDouble * s / nd) / nd)
    }
    rows.foreach { case ((tpe, _), (_, u, d, flag)) =>
      val sig = byType(tpe)
      assert(flag == (u > TrendQueries.CusumH * sig ||
        d > TrendQueries.CusumH * sig))
    }
  }

  test("trend: OLS moments match the textbook fit; forecast extrapolates") {
    val rows = TrendQueries.queries("events_trend_forecast")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))
      .toMap
    assert(rows.nonEmpty)
    dailyCounts.foreach { case (tpe, series) =>
      val t0 = series.map(_._1).min
      val ts = series.map { case (day, n) => (day - t0, n) }
      val nd = ts.length.toLong
      val (st, stt) = (ts.map(_._1).sum, ts.map(x => x._1 * x._1).sum)
      val (sn, stn) = (ts.map(_._2).sum, ts.map(x => x._1 * x._2).sum)
      val snn = ts.map(x => x._2 * x._2).sum
      val (num, den, dvar) =
        (nd * stn - st * sn, nd * stt - st * st, nd * snn - sn * sn)
      if (nd >= 2 && den > 0) {
        val (gotNd, slope, intercept, r2, fc) = rows(tpe)
        assert(gotNd == nd)
        assert(slope == num.toDouble / den.toDouble)
        assert(intercept == (sn.toDouble - slope * st) / nd)
        val expR2 = if (dvar == 0L) 1.0
          else num.toDouble * num.toDouble / (den.toDouble * dvar.toDouble)
        assert(r2 == expR2)
        assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
        assert(fc == intercept + slope * (ts.map(_._1).max + 1L))
      } else assert(!rows.contains(tpe))
    }
  }

  test("backtest: each origin's fit equals a direct prefix OLS refit") {
    val rows = TrendQueries.queries("events_forecast_backtest")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    val series = EventsQueries.events(spark, sf)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = math.min(TrendQueries.BacktestOrigins, series.length - 1L)
    assert(rows.length.toLong === want, "one scored row per tail origin")
    val day0 = series.map(_._1).min
    rows.foreach { case (origin, nFit, yhat, actual, absErr) =>
      val prefix = series.filter(_._1 <= origin)
      assert(nFit === prefix.length.toLong, s"origin $origin: fit size")
      val (nd, ts) = (prefix.length.toLong, prefix.map(p => p._1 - day0))
      val ns = prefix.map(_._2)
      val (st, stt) = (ts.sum, ts.map(t => t * t).sum)
      val (sn, stn) = (ns.sum, ts.zip(ns).map { case (t, n) => t * n }.sum)
      val slope = (nd * stn - st * sn).toDouble /
        (nd * stt - st * st).toDouble
      val nextIdx = series.indexWhere(_._1 > origin)
      val nextT = series(nextIdx)._1 - day0
      assert(actual === series(nextIdx)._2, s"origin $origin: actual")
      val expYhat = (sn.toDouble - slope * st) / nd + slope * nextT
      assert(yhat === expYhat, s"origin $origin: out-of-sample prediction")
      assert(absErr === math.abs(expYhat - actual.toDouble))
    }
  }

  // percentile's linear interpolation over sorted values: v[floor(h)] +
  // (h - floor(h)) * (v[ceil(h)] - v[floor(h)]) at h = (n-1)*q
  private def medianInterp(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val h = (s.length - 1) * 0.5
    val lo = h.toInt
    if (lo == h) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
  }

  test("theil-sen: medians of pairwise slopes and residuals, exactly") {
    val rows = TrendQueries.queries("events_theilsen_trend")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.nonEmpty)
    dailyCounts.foreach { case (tpe, series) =>
      val pairs = for {
        i <- series.indices; j <- series.indices if i < j
      } yield (series(j)._2 - series(i)._2).toDouble /
        (series(j)._1 - series(i)._1)
      val slope = medianInterp(pairs)
      val intercept = medianInterp(series.map { case (d, n) =>
        n.toDouble - slope * d
      })
      val (nd, np, gs, gi, fc) = rows(tpe)
      assert(nd == series.length.toLong)
      assert(np == pairs.length.toLong)
      assert(gs == slope, s"slope($tpe)")
      assert(gi == intercept, s"intercept($tpe)")
      assert(fc == slope * (series.map(_._1).max + 1) + intercept)
      // robustness sanity: the median slope is inside the pair range
      assert(slope >= pairs.min && slope <= pairs.max)
    }
  }

  test("median ci: order-statistic bounds bracket the median per type") {
    val rows = TrendQueries.queries("events_median_ci")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val values = EventsQueries.events(spark, sf)
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (tpe, n, median, lo, hi) =>
      val vs = values(tpe).sortBy(v => (v._2, v._3)).map(_._2)
      assert(n == vs.length.toLong)
      val loR = math.max(1L,
        math.floor((n - 1.96 * math.sqrt(n.toDouble)) / 2.0).toLong)
      val hiR = math.min(n,
        math.ceil((n + 1.96 * math.sqrt(n.toDouble)) / 2.0).toLong + 1)
      assert(lo == vs((loR - 1).toInt), s"$tpe lo")
      assert(hi == vs((hiR - 1).toInt), s"$tpe hi")
      // the interval brackets the reported median, and is nondegenerate
      assert(lo <= median && median <= hi, s"$tpe bracket")
      assert(lo < hi, s"$tpe width")
    }
  }
}
