package graft.events

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Conservation laws for the cohort family — the invariants that hold on
  * ANY events corpus, independent of the fixture's particular values. */
class CohortSpec extends SparkSpec {

  test("growth curve: n_new sums to the user count; cum matches prefix") {
    val rows = CohortQueries.queries("events_new_users_curve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalUsers = EventsQueries.events(spark, sf)
      .select(countDistinct("user_id")).head().getLong(0)
    assert(rows.map(_._3).sum === totalUsers)
    assert(rows.last._4 === totalUsers, "final cumulative != user count")
    val prefix = rows.map(_._3).scanLeft(0L)(_ + _).drop(1)
    assert(rows.map(_._4).toSeq === prefix.toSeq, "cum_users is not the prefix sum")
    rows.foreach { case (d, active, nNew, _) =>
      assert(nNew <= active, s"day $d: more new users than active users")
    }
  }

  test("retention matrix: age 0 is exactly 1.0, cells never exceed cohort") {
    val cells = CohortQueries.queries("events_cohort_retention")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(cells.nonEmpty)
    val age0 = cells.filter(_._2 == 0L)
    assert(age0.nonEmpty)
    age0.foreach { case (c, _, n, size, pct) =>
      assert(n === size && pct === 1.0,
        s"cohort $c at age 0 must retain everyone ($n of $size)")
    }
    cells.foreach { case (c, a, n, size, pct) =>
      assert(a >= 0 && n >= 1 && n <= size,
        s"cell ($c, $a) outside [1, cohort_size]")
      assert(pct === n.toDouble / size.toDouble)
    }
  }
}
