package graft.events

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The lifecycle trio against independent driver-side recomputations
  * from the raw collected events — the textbook definitions, not the
  * window/fold machinery the queries use. */
class LifecycleSpec extends SparkSpec {

  private lazy val raw: Seq[(Long, Long, Long, String, Option[Double])] =
    EventsQueries.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq

  test("window dedup: ledger equals a per-key scan of the sorted feed") {
    val got = LifecycleQueries.queries("events_window_dedup")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expected = raw.groupBy(e => (e._3, e._4)).toSeq.flatMap {
      case ((_, tpe), evs) =>
        val ts = evs.sortBy(e => (e._2, e._1)).map(_._2)
        val dups = ts.zip(ts.drop(1))
          .count { case (a, b) => b - a <= LifecycleQueries.DedupWindowUs }
        Seq(tpe -> (ts.size.toLong, dups.toLong))
    }.groupBy(_._1).view.mapValues { xs =>
      val tot = xs.map(_._2._1).sum
      val dup = xs.map(_._2._2).sum
      (tot, dup, tot - dup)
    }.toMap
    assert(got == expected)
    // conservation: kept + dup = total, and at least one type has dups
    // at every SF (the fixture's purchase retransmissions)
    assert(got.values.map(v => v._2 + v._3) == got.values.map(_._1))
    assert(got.values.exists(_._2 > 0))
  }

  test("kaplan-meier: curve equals the textbook estimator; KM laws hold") {
    val rows = LifecycleQueries.queries("events_kaplan_meier")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // independent recomputation from per-user durations
    // .toSeq BEFORE mapping: mapping the Map directly would collapse
    // users sharing a (duration, censored) pair
    val durations = raw.groupBy(_._3).toSeq.map { case (_, evs) =>
      val first = evs.map(_._2).min
      val conv = evs.collect {
        case (_, ts, _, "purchase", Some(v))
            if v >= LifecycleQueries.ConvValueMin => ts
      }
      if (conv.nonEmpty)
        ((conv.min - first) / EventsQueries.DayUs, false)
      else ((evs.map(_._2).max - first) / EventsQueries.DayUs, true)
    }
    val byDay = durations.groupBy(_._1).view.mapValues { xs =>
      (xs.count(!_._2).toLong, xs.count(_._2).toLong)
    }.toMap
    var surv = 1.0
    val expected = byDay.keys.toSeq.sorted.map { d =>
      val (conv, cens) = byDay(d)
      val risk = durations.count(_._1 >= d).toLong
      surv *= 1.0 - conv.toDouble / risk
      (d, risk, conv, cens, surv)
    }
    assert(rows.toSeq == expected)
    // laws: survival non-increasing, within [0,1], risk strictly
    // decreasing, censored users present (the ~54% never-converters)
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._5 <= a._5 && b._2 < a._2; case _ => true
    })
    assert(rows.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    assert(rows.map(_._4).sum > 0)
  }

  test("bot suspects: burstiness ranking equals the direct recount") {
    val got = LifecycleQueries.queries("events_bot_suspects")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val expected = raw.groupBy(_._3).toSeq
      .map { case (u, evs) =>
        val ts = evs.sortBy(e => (e._2, e._1)).map(_._2)
        val gaps = ts.zip(ts.drop(1)).map { case (a, b) => (b - a) / 1000000L }
        val (s1, s2) = (gaps.sum, gaps.map(g => g * g).sum)
        (u, ts.size.toLong, gaps.size.toLong, s1, s2)
      }
      .filter(x => x._2 >= LifecycleQueries.MinBotEvents && x._4 > 0)
      .map { case (u, n, g, s1, s2) =>
        (u, n, g, s1.toDouble / g, (g * s2 - s1 * s1).toDouble / (s1 * s1))
      }
      .sortBy(x => (x._5, x._1))
      .take(LifecycleQueries.BotTopK)
    assert(got.toSeq == expected)
    // the queue is ordered most-metronomic first and cv2 is sane
    assert(got.sliding(2).forall {
      case Array(a, b) => a._5 <= b._5; case _ => true
    })
    assert(got.forall(_._5 >= 0.0))
  }

  test("holt: fold equals the textbook recursion; forecast extrapolates") {
    val rows = LifecycleQueries.queries("events_holt_linear")(spark, sf)
      .collect()
    val series = raw.groupBy(_._2 / EventsQueries.DayUs).view
      .mapValues(_.size.toDouble).toSeq.sortBy(_._1)
    val xs = series.map(_._2)
    // textbook recursion, duplicated-expression form (matches the
    // lambda's bit-exact shape)
    var l = xs(0)
    var b = xs(1) - xs(0)
    val states = Seq((l, b, Option.empty[Double])) ++ (1 until xs.size).map { t =>
      val fitted = l + b
      val l2 = 0.2 * xs(t) + 0.8 * (l + b)
      val b2 = 0.1 * (l2 - l) + 0.9 * b
      l = l2; b = b2
      (l, b, Some(fitted))
    }
    val fitRows = rows.filter(!_.isNullAt(1))
    assert(fitRows.length == xs.size)
    fitRows.zip(states).zip(series).foreach {
      case ((r, (el, eb, ef)), (day, x)) =>
        assert(r.getLong(0) == day)
        assert(r.getDouble(1) == x)
        assert(r.getDouble(2) == el)
        assert(r.getDouble(3) == eb)
        assert(ef.forall(_ == r.getDouble(4)) &&
          ef.isEmpty == r.isNullAt(4))
    }
    // forecast rows: h = 1..HoltH beyond the last day, linear in h
    val fc = rows.filter(_.isNullAt(1))
    assert(fc.length == LifecycleQueries.HoltH)
    fc.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == series.last._1 + i + 1)
      assert(r.getDouble(4) == l + (i + 1).toDouble * b)
    }
  }
}
