package graft.events

import graft.SparkSpec

/** DiD against a direct driver-side recomputation of the four cells. */
class CausalSpec extends SparkSpec {

  test("did uplift: cells and the combination equal the direct recount") {
    val rows = CausalQueries.queries("events_did_uplift")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 4)
    assert(rows.map(r => (r._1, r._2)).toSet ==
      Set((0L, "pre"), (0L, "post"), (1L, "pre"), (1L, "post")))
    val raw = EventsQueries.events(spark, sf)
      .select("ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0) / EventsQueries.DayUs, r.getLong(1),
        r.getString(2)))
    val split = (raw.map(_._1).min + raw.map(_._1).max + 1) / 2
    val cells = raw.groupBy(e =>
        (e._2 % 2, if (e._1 < split) "pre" else "post"))
      .view.mapValues { es =>
        (es.map(_._2).distinct.length.toLong,
          es.count(_._3 == "purchase").toLong)
      }.toMap
    rows.foreach { case (arm, period, nu, np, mean, _) =>
      val (enu, enp) = cells((arm, period))
      assert(nu == enu && np == enp, s"cell ($arm,$period)")
      assert(mean == np.toDouble / nu)
    }
    def m(arm: Long, p: String) = {
      val (nu, np) = cells((arm, p))
      np.toDouble / nu
    }
    val did = (m(1, "post") - m(1, "pre")) - (m(0, "post") - m(0, "pre"))
    assert(rows.forall(_._6 == did))
  }

  test("srm: chi2 equals the two-cell formula over distinct users") {
    val r = CausalQueries.queries("events_ab_srm")(spark, sf)
      .collect().head
    val users = EventsQueries.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val na = users.count(_ % 2 == 0).toLong
    val nb = users.count(_ % 2 == 1).toLong
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    val chi2 = ((na - nb) * (na - nb)).toDouble / (na + nb)
    assert(r.getDouble(2) == chi2)
    assert(r.getBoolean(3) == (chi2 > CausalQueries.SrmChi2Crit95))
  }

  test("cuped: theta, rho2, and adjusted means equal the moment algebra") {
    val rows = CausalQueries.queries("events_cuped")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    val raw = EventsQueries.events(spark, sf)
      .select("ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0) / EventsQueries.DayUs, r.getLong(1),
        r.getString(2)))
    val split = (raw.map(_._1).min + raw.map(_._1).max + 1) / 2
    val users = raw.groupBy(_._2).toSeq.map { case (u, es) =>
      (u, es.count(_._1 < split).toLong,
        es.count(e => e._1 >= split && e._3 == "purchase").toLong)
    }
    val n = users.length.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val syy = users.map(u => u._3 * u._3).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val rho2 = (n * sxy - sx * sy).toDouble * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy))
    rows.foreach { case (arm, nu, my, mx, th, r2, adj) =>
      val au = users.filter(_._1 % 2 == arm)
      assert(nu == au.length.toLong)
      assert(my == au.map(_._3).sum.toDouble / au.length)
      assert(mx == au.map(_._2).sum.toDouble / au.length)
      assert(th == theta && r2 == rho2)
      assert(adj == au.map(_._3).sum.toDouble / au.length -
        theta * (au.map(_._2).sum.toDouble / au.length -
          sx.toDouble / n))
    }
    // the covariate genuinely explains variance on this fixture
    assert(rho2 > 0.0 && rho2 < 1.0)
  }

  test("power mde: closed form over exact moments; cuped shrinks it") {
    val r = CausalQueries.queries("events_power_mde")(spark, sf)
      .collect().head
    val (na, nb, meanY, varY, rho2, mde, mdeC) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(na > 0 && nb > 0 && varY > 0)
    assert(mde == CausalQueries.ZSum8005 *
      math.sqrt(varY * (1.0 / na + 1.0 / nb)))
    assert(mdeC == mde * math.sqrt(1.0 - rho2))
    // CUPED strictly tightens whenever the covariate correlates
    assert(mdeC < mde)
    // sanity: the MDE is on the outcome's scale
    assert(mde > 0 && mde < meanY * 10 + 1)
  }

  test("stratified effect: cells and the pooled fold equal the recount") {
    val rows = CausalQueries
      .queries("events_stratified_effect")(spark, sf)
      .collect()
    val raw = EventsQueries.events(spark, sf)
      .select("ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0) / EventsQueries.DayUs, r.getLong(1),
        r.getString(2)))
    val split = (raw.map(_._1).min + raw.map(_._1).max + 1) / 2
    val users = raw.groupBy(_._2).toSeq.map { case (u, es) =>
      val x = es.count(_._1 < split).toLong
      val y = es.count(e => e._1 >= split && e._3 == "purchase").toLong
      val st = if (x < 10) 0L else if (x < 25) 1L else if (x < 45) 2L else 3L
      (u % 2, st, y)
    }
    val cells = users.groupBy(_._2).view.mapValues { us =>
      val c = us.filter(_._1 == 0L); val t = us.filter(_._1 == 1L)
      (us.length.toLong, c.length.toLong, t.length.toLong,
        c.map(_._3).sum, t.map(_._3).sum)
    }.toMap
    val diffs = cells.toSeq.sortBy(_._1).flatMap {
      case (st, (nu, nc, nt, syc, syt)) if nc > 0 && nt > 0 =>
        Some((st, nu, syt.toDouble / nt - syc.toDouble / nc))
      case _ => None
    }
    val pooled = diffs.foldLeft(0.0) { case (a, (_, nu, d)) =>
      a + d * nu
    } / diffs.map(_._2).sum.toDouble
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val st = r.getInt(0).toLong
      val (nu, nc, nt, syc, syt) = cells(st)
      assert(r.getLong(1) == nu && r.getLong(2) == nc && r.getLong(3) == nt)
      // a stratum can lack an arm at tiny SFs — its means are NULL and
      // it is excluded from the pooled effect, by design
      assert(r.isNullAt(4) == (nc == 0))
      if (nc > 0) assert(r.getDouble(4) == syc.toDouble / nc)
      assert(r.isNullAt(5) == (nt == 0))
      if (nt > 0) assert(r.getDouble(5) == syt.toDouble / nt)
      assert(r.isNullAt(6) == (nc == 0 || nt == 0))
      assert(r.getDouble(7) == pooled)
    }
    assert(diffs.nonEmpty)
  }
}
