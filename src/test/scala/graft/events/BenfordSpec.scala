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

  test("digit ladder classifies the full DECIMAL(18,2) cents range") {
    // the old ladder topped out at 10^7 cents: a $150,000 value yielded
    // digit 15, element_at(pArr, 15) = NULL, and the whole audit nulled.
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val probes: Seq[Long] = Seq(1L, 9L, 10L, 99L, 15000000L, // $150k
      987654321098L, Long.MaxValue / 10, BigInt(10).pow(18).toLong)
    val got = probes.toDF("c")
      .select(expr(BenfordQueries.digitLadder("div")).as("d"))
      .collect().map(_.getLong(0))
    def firstDigit(c: Long): Long = { var x = c; while (x >= 10) x /= 10; x }
    assert(got.toSeq == probes.map(firstDigit))
    assert(got.forall(d => d >= 1 && d <= 9))
  }
}
