package graft.text

import graft.SparkSpec

class BudgetSpec extends SparkSpec {
  import BudgetQueries._

  private def rows() =
    queries("corpus_budget_waterfill")(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))

  test("waterfill invariants: caps respected, budget filled to < k deficit") {
    val rs = rows()
    assert(rs.nonEmpty)
    val budget = BudgetEpochs * rs.map(_._2).sum
    val alloc = rs.map(_._5).sum
    for ((src, s, w, cap, a, _) <- rs) {
      assert(cap == EpochCap * s, src)
      assert(a >= 0 && a <= cap, s"$src alloc $a exceeds cap $cap")
      assert(w >= 1 && w <= 4)
    }
    val nUnsat = rs.count(!_._6)
    assert(alloc <= budget)
    assert(budget - alloc < math.max(nUnsat.toLong, 1L),
      s"deficit ${budget - alloc} should be < $nUnsat floor losses")
    // the fixture must actually exercise the kink: some of each
    assert(rs.exists(_._6) && nUnsat > 0,
      "parameters degenerate — no saturation boundary hit")
  }

  test("water level: unsaturated allocs share one λ (±1 floor wobble)") {
    val rs = rows()
    val levels = rs.filter(!_._6).map { case (_, _, w, _, a, _) =>
      a.toDouble / w
    }
    assert(levels.nonEmpty)
    assert(levels.max - levels.min <= 1.0,
      s"unsaturated allocs not level: ${levels.min} .. ${levels.max}")
    // every saturated source sits AT or BELOW the level — that is WHY
    // it capped out
    val lvl = levels.min
    for ((src, _, w, cap, _, sat) <- rs if sat)
      assert(cap.toDouble / w <= lvl + 1.0, s"$src saturated above the level")
  }

  test("draw covers the allocation; overshoot bounded by one straddler") {
    import org.apache.spark.sql.functions._
    val alloc = rows().map(r => r._1 -> (r._2, r._5)).toMap
    val maxTok = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source")
      .agg(max(size(split(col("text"), " ")).cast("long")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val draw = queries("corpus_budget_draw")(spark, sf).collect()
    assert(draw.length == alloc.size)
    for (r <- draw) {
      val (src, a, fe, pd, pt, drawn) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (sTok, aTok) = alloc(src)
      assert(a == aTok)
      assert(fe == a / sTok, s"$src full epochs")
      assert(drawn == fe * sTok + pt)
      assert(drawn >= a, s"$src drew $drawn < alloc $a")
      assert(drawn - a < maxTok(src),
        s"$src overshoot ${drawn - a} ≥ longest doc ${maxTok(src)}")
      assert((pd == 0) == (a % sTok == 0), s"$src partial-doc presence")
    }
  }

  test("epoch order: distinct deterministic permutations, top-k plan") {
    val df = queries("corpus_epoch_order")(spark, sf)
    val out = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == Epochs.size * EpochHead)
    val byEpoch = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    // positions are 1..EpochHead within each epoch, prefixes disagree
    for (e <- Epochs)
      assert(out.filter(_._1 == e).map(_._2).sorted.toSeq ==
        (1L to EpochHead).toSeq)
    assert(byEpoch(0L).toSeq != byEpoch(1L).toSeq,
      "epoch permutations should differ")
    // deterministic: a second evaluation reproduces the rows exactly
    val again = queries("corpus_epoch_order")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
    // prefix plans as top-k, not a global sort of the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n${plan.take(1500)}")
  }

  test("closed form matches the sequential greedy water-fill") {
    val rs = rows()
    // independent reimplementation: saturate sources one at a time in
    // ascending cap/w order while doing so leaves everyone else at or
    // above that source's saturation point
    val items = rs.map { case (src, s, w, cap, _, _) => (src, w, cap) }
      .sortBy { case (src, w, cap) => (WLcm * cap / w, src) }
    val budget = BudgetEpochs * rs.map(_._2).sum
    var satCap = 0L
    var wRem = items.map(_._2).sum
    val saturated = scala.collection.mutable.Set[String]()
    var continue = true
    for ((src, w, cap) <- items if continue) {
      val s2 = satCap + cap
      val w2 = wRem - w
      if (WLcm * cap / w * w2 <= WLcm * (budget - s2)) {
        saturated += src; satCap = s2; wRem = w2
      } else continue = false
    }
    val expected = items.map { case (src, w, cap) =>
      src -> (if (saturated(src)) cap
              else math.min(cap, w * (budget - satCap) / wRem))
    }.toMap
    for ((src, _, _, _, a, sat) <- rs) {
      assert(a == expected(src), s"$src: query $a vs greedy ${expected(src)}")
      assert(sat == saturated(src), s"$src saturation flag")
    }
  }
}
