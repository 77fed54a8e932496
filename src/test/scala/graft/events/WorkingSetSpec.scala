package graft.events

import graft.SparkSpec

/** The relational stack-distance curve against an ACTUAL simulated LRU
  * cache — the Mattson identity (hit@C ⟺ stack distance < C) proven
  * end-to-end on the fixture trace, not assumed. */
class WorkingSetSpec extends SparkSpec {

  test("lru curve: equals a direct LRU simulation at every capacity") {
    val rows = WorkingSetQueries
      .queries("events_state_lru_curve")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val trace = EventsQueries.events(spark, sf)
      .select("ts", "event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2)).map(_._3)
    val users = trace.distinct.length.toLong
    rows.foreach { case (cap, nAcc, nComp, nHits, rate) =>
      assert(nAcc == trace.length.toLong)
      assert(nComp == users)
      // true LRU: most-recently-used-ordered set, evict from the tail
      val lru = new java.util.LinkedHashMap[Long, Unit](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Long, Unit]): Boolean = size() > cap
      }
      var hits = 0L
      trace.foreach { u =>
        if (lru.containsKey(u)) hits += 1
        lru.put(u, ())
      }
      assert(nHits == hits, s"capacity $cap")
      assert(rate == nHits.toDouble / nAcc)
    }
    // the curve is monotone in capacity and capped by re-accesses
    val hitsByCap = rows.sortBy(_._1).map(_._4)
    assert(hitsByCap.zip(hitsByCap.drop(1)).forall { case (a, b) => a <= b })
    assert(rows.forall(r => r._4 <= r._2 - r._3))
  }
}
