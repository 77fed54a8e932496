package graft.events

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-random property tests for the factored statistics cores. The
  * fixture's near-uniform counts and dense day series leave the two
  * hardest code paths — Pareto tie-slicing at the p% boundary and ACF
  * pairing across day gaps — barely exercised; these drive them with
  * adversarial synthetic inputs and demand bit equality against direct
  * driver-side computation. */
class StatsPropertySpec extends SparkSpec {

  test("pareto walk: tie-heavy random counts equal the sorted top-k sum") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      // few distinct count values over many users ⇒ every p% boundary
      // lands inside a tie group, the pro-rata slice is always active
      val counts = Seq.fill(307)(1L + rnd.nextInt(4).toLong)
      val perUser = counts.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("user_id", "c")
      val rows = JourneyQueries.paretoFromCounts(spark, perUser)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val sorted = counts.sortBy(-_)
      val total = counts.sum
      assert(rows.map(_._1).toSeq === Seq(1L, 5L, 10L, 25L, 50L), s"seed $seed")
      for ((pct, k, top, share) <- rows) {
        assert(k === math.max(1L, counts.size.toLong * pct / 100L))
        assert(top === sorted.take(k.toInt).sum,
          s"seed $seed pct $pct: boundary slice differs from direct top-k")
        assert(share === top.toDouble / total.toDouble)
      }
    }
  }

  test("acf: gappy random series equals the exact pair-restricted moments") {
    import spark.implicits._
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      // ~35% of days missing ⇒ every lag has a different (and strict)
      // pair subset; values spread two decades to stress the moments
      val series = (0L until 120L)
        .filter(_ => rnd.nextDouble() > 0.35)
        .map(day => day -> (1L + rnd.nextInt(900).toLong))
      val d = series.toDF("day", "x")
      val rows = TrendQueries.acfFromDaily(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val m = series.toMap
      val n = m.size.toLong
      val s1 = m.values.sum
      val s2 = m.values.map(x => x * x).sum
      val den = n * n * s2 - n * s1 * s1
      assert(rows.map(_._1).toSeq ===
        (1L to TrendQueries.MaxAcfLag.toLong), s"seed $seed")
      for ((lag, nPairs, acf) <- rows) {
        val pairs = m.toSeq.flatMap { case (day, x) =>
          m.get(day + lag).map(y => (x, y))
        }
        assert(nPairs === pairs.size.toLong, s"seed $seed lag $lag")
        assert(nPairs < n - lag + 1,
          s"seed $seed lag $lag: gaps must actually restrict the pairs")
        val num = n * n * pairs.map { case (x, y) => x * y }.sum -
          n * s1 * (pairs.map(_._1).sum + pairs.map(_._2).sum) +
          nPairs * s1 * s1
        assert(acf === num.toDouble / den.toDouble,
          s"seed $seed lag $lag: acf differs on the gappy series")
      }
    }
  }

  test("ks walk: random sparse histograms equal the direct ECDF max-gap") {
    import spark.implicits._
    for (seed <- Seq(2, 13, 99)) {
      val rnd = new Random(seed)
      // sparse bins with empty stretches and one-sided bins (a_n or b_n
      // zero) — the walk must carry the other side's CDF through them
      val hist = (0L until 60L).filter(_ => rnd.nextDouble() > 0.4)
        .map(b => (b, rnd.nextInt(5).toLong, rnd.nextInt(5).toLong))
        .filter { case (_, a, b) => a + b > 0 }
      val d = hist.toDF("vbin", "a_n", "b_n")
      val r = CohortQueries.ksFromBinned(d).head()
      val nA = hist.map(_._2).sum
      val nB = hist.map(_._3).sum
      assert(r.getLong(0) === nA && r.getLong(1) === nB, s"seed $seed")
      // direct walk in bin order
      var (ca, cb) = (0L, 0L)
      val gaps = hist.sortBy(_._1).map { case (_, a, b) =>
        ca += a; cb += b
        math.abs(ca.toDouble / nA.toDouble - cb.toDouble / nB.toDouble)
      }
      assert(r.getDouble(2) === gaps.max,
        s"seed $seed: D differs from the direct ECDF walk")
      val crit = 1.358 * math.sqrt((nA + nB).toDouble / (nA * nB).toDouble)
      assert(r.getDouble(3) === crit && r.getBoolean(4) === (gaps.max > crit),
        s"seed $seed: critical value or verdict differs")
    }
  }

  test("session funnel: random feeds equal the direct step-ledger walk") {
    import spark.implicits._
    val gap = EventsQueries.SessionGapUs
    for (seed <- Seq(4, 17)) {
      val rnd = new Random(seed)
      // bursty feed: few users, timestamps clustered so sessions really
      // split; event types weighted toward views; ids unique
      val feed = (0 until 400).map { i =>
        val user = rnd.nextInt(5).toLong
        val ts = rnd.nextInt(20).toLong * gap / 2 + rnd.nextInt(1000).toLong
        val tpe = Seq("view", "view", "click", "purchase",
          "error")(rnd.nextInt(5))
        (i.toLong, ts, user, tpe)
      }
      val df = feed.toDF("event_id", "ts", "user_id", "event_type")
      val r = JourneyQueries.sessionFunnelFrom(df).head()

      // direct computation: per user, sort by (ts, id), split on gap,
      // then the ordered v→c→p ledger inside each session
      val sessions = feed.groupBy(_._3).toSeq.flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._1))
        val splits = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(sorted.head))
        for (Seq(a, b) <- sorted.sliding(2) if sorted.size > 1)
          if (b._2 - a._2 > gap) splits += scala.collection.mutable.ArrayBuffer(b)
          else splits.last += b
        splits.map(_.toSeq)
      }
      val viewed = sessions.flatMap(se =>
        se.filter(_._4 == "view").map(_._2).minOption.map(se -> _))
      val clicked = viewed.flatMap { case (se, vTs) =>
        se.filter(e => e._4 == "click" && e._2 >= vTs).map(_._2)
          .minOption.map(se -> _) }
      val purchased = clicked.count { case (se, cTs) =>
        se.exists(e => e._4 == "purchase" && e._2 >= cTs) }
      assert(r.getLong(0) === sessions.size.toLong, s"seed $seed: sessions")
      assert(r.getLong(1) === viewed.size.toLong, s"seed $seed: viewed")
      assert(r.getLong(2) === clicked.size.toLong, s"seed $seed: clicked")
      assert(r.getLong(3) === purchased.toLong, s"seed $seed: purchased")
    }
  }

  test("modularity: random labeled graphs equal the direct per-label rationals") {
    import spark.implicits._
    for (seed <- Seq(5, 21)) {
      val rnd = new Random(seed)
      // heavy self-label bias on some labels, none on others; label ids
      // as strings to mirror the source column
      val labels = Vector("s0", "s1", "s2", "s3", "s4")
      val edges = Seq.fill(173) {
        val a = labels(rnd.nextInt(labels.size))
        val b = if (rnd.nextDouble() < 0.5) a
                else labels(rnd.nextInt(labels.size))
        (a, b)
      }
      val rows = graft.graph.GraphXAnalytics
        .modularityFromLabeledEdges(edges.toDF("src_a", "src_b"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val m = edges.size.toLong
      val degD = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val intraD = edges.filter(e => e._1 == e._2)
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(rows.map(_._1).toSet === degD.keySet, s"seed $seed")
      for ((lbl, dg, ei, q) <- rows) {
        assert(dg === degD(lbl) && ei === intraD.getOrElse(lbl, 0L),
          s"seed $seed $lbl: degree or intra count differs")
        assert(q === (4 * m * ei - dg * dg).toDouble / (4 * m * m).toDouble,
          s"seed $seed $lbl: q_contrib differs from the exact rational")
      }
      // handshake + global bound
      assert(rows.map(_._2).sum === 2 * m, s"seed $seed: handshake")
      val qSum = rows.map(_._4).sum
      assert(qSum >= -1.0 && qSum <= 1.0, s"seed $seed: Q=$qSum out of range")
    }
  }
}
