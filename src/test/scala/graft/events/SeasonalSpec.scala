package graft.events

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Holt–Winters against a plain-Scala replay of the triple recursion —
  * the textbook loop, not the generated fold/CTE machinery. */
class SeasonalSpec extends SparkSpec {

  test("holt-winters: fold equals the textbook recursion; forecast too") {
    val rows = SeasonalQueries.queries("events_holt_winters")(spark, sf)
      .collect()
    val series = EventsQueries.events(spark, sf)
      .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val P = SeasonalQueries.Period
    assert(series.length >= 2 * P + 1, "needs two init weeks + data")
    val (alpha, beta, gamma) = (0.3, 0.1, 0.2)
    val m1 = series.take(P).map(_._2).sum.toDouble / 7.0
    val m2 = series.slice(P, 2 * P).map(_._2).sum.toDouble / 7.0
    var l = m1
    var b = (m2 - m1) / 7.0
    val s = Array.tabulate(P) { j =>
      val x = series.take(P).find(e => (e._1 + 3) % 7 == j).get._2
      x.toDouble - m1
    }
    val fits = series.drop(P).map { case (day, n) =>
      val w = ((day + 3) % 7).toInt
      val fitted = l + b + s(w)
      val seasUsed = s(w)
      val l2 = alpha * (n - s(w)) + (1.0 - alpha) * (l + b)
      val b2 = beta * (l2 - l) + (1.0 - beta) * b
      s(w) = gamma * (n - l2) + (1.0 - gamma) * s(w)
      l = l2; b = b2
      (day, n.toDouble, l, b, s(w), seasUsed, fitted)
    }
    val emitted = fits.drop(P) // the first post-init week is withheld
    val fitRows = rows.filter(!_.isNullAt(1))
    assert(fitRows.length == emitted.length)
    fitRows.zip(emitted).foreach {
      // the emitted `seasonal` is the slot value USED at t (pre-update):
      // the component decomposition a reader subtracts from x
      case (r, (day, x, el, eb, _, esUsed, ef)) =>
        assert(r.getLong(0) == day)
        assert(r.getDouble(1) == x)
        assert(r.getDouble(2) == el, s"level day $day")
        assert(r.getDouble(3) == eb, s"trend day $day")
        assert(r.getDouble(4) == esUsed, s"seasonal day $day")
        assert(r.getDouble(5) == ef, s"fitted day $day")
    }
    // forecasts extrapolate level + h*trend + that weekday's seasonal
    val fc = rows.filter(_.isNullAt(1))
    assert(fc.length == SeasonalQueries.ForecastH)
    val lastDay = series.last._1
    fc.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      val day = lastDay + h
      assert(r.getLong(0) == day)
      assert(r.getDouble(5) == l + h.toDouble * b + s(((day + 3) % 7).toInt))
    }
  }

  test("seasonal anomaly: fence laws over the residual series") {
    val rows = SeasonalQueries
      .queries("events_seasonal_anomaly")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, x, fitted, resid, med, mad, flag) =>
      assert(resid == x - fitted)
      assert(flag == (math.abs(resid - med) >
        SeasonalQueries.MadK * mad))
    }
    // one fence for the whole series
    assert(rows.map(r => (r._5, r._6)).distinct.length == 1)
    assert(rows.head._6 >= 0.0)
    // at least half the days sit inside any sane fence
    assert(rows.count(!_._7) * 2 >= rows.length)
  }
}
