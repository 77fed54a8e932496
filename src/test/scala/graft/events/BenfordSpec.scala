package graft.events

import graft.SparkSpec

/** The Benford audit against a driver-side recomputation from exact
  * cents, plus its distribution laws. */
class BenfordSpec extends SparkSpec {

  test("benford audit: digits, shares, and chi2 equal the direct census") {
    val rows = BenfordQueries.queries("events_benford_audit")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    // driver-side recount from exact cents (BigDecimal, like the query)
    val cents = EventsQueries.events(spark, sf)
      .select("value").collect().map(_.getDouble(0))
      .filter(_ >= 0.01)
      .map(v => (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        * 100).toLongExact)
    def firstDigit(c: Long): Long = { var x = c; while (x >= 10) x /= 10; x }
    val hist = cents.groupBy(firstDigit).view.mapValues(_.length.toLong).toMap
    val n = cents.length.toLong
    assert(rows.map(r => r._1 -> r._2).toMap == hist)
    rows.foreach { case (d, obs, share, p, _, _) =>
      assert(d >= 1 && d <= 9)
      assert(share == obs.toDouble / n)
      assert(p == BenfordQueries.BenfordP(d.toInt - 1))
    }
    // chi2: fold in digit order, exactly as the query defines it
    val chi2 = rows.sortBy(_._1).foldLeft(0.0) { case (acc, (_, obs, _, p, _, _)) =>
      acc + (obs.toDouble - n.toDouble * p) * (obs.toDouble - n.toDouble * p) /
        (n.toDouble * p)
    }
    assert(rows.forall(_._5 == chi2))
    assert(rows.forall(r => r._6 == (chi2 < BenfordQueries.Chi2Crit99)))
    // shares form a distribution over the audited rows
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
  }
}
