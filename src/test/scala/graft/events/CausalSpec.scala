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
}
