package graft.relational

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of: latest right at-or-before each left, null when none") {
    val left = Seq(
      ("u1", 5L, "e1"), ("u1", 10L, "e2"), ("u1", 20L, "e3"),
      ("u2", 7L, "e4"), // u2 has no signup before 7
      ("u2", 30L, "e5")
    ).toDF("user", "ts", "tag")
    val right = Seq(
      ("u1", 10L, "r_a"), // equal ts: inclusive, e2 must see r_a
      ("u1", 15L, "r_b"),
      ("u2", 25L, "r_c")
    ).toDF("user", "rts", "info")

    val got = AsOfJoin.asofJoin(left, right, Seq("user"), "ts", "rts",
        Seq("info"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap

    assert(got("e1") === None) // nothing at or before 5
    assert(got("e2") === Some("r_a")) // inclusive equality
    assert(got("e3") === Some("r_b")) // latest of two preceding
    assert(got("e4") === None)
    assert(got("e5") === Some("r_c"))
  }

  test("as-of law on random data: equals brute-force max(rts <= ts) per key") {
    val rnd = new scala.util.Random(13)
    val leftRows = (1 to 300).map { i =>
      (s"u${rnd.nextInt(5)}", rnd.nextInt(100).toLong, s"e$i")
    }
    val rightRows = (1 to 60).map { i =>
      (s"u${rnd.nextInt(5)}", rnd.nextInt(100).toLong, s"r$i")
    }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)

    val got = AsOfJoin.asofJoin(
        leftRows.toDF("user", "ts", "tag"),
        rightRows.toDF("user", "rts", "info"),
        Seq("user"), "ts", "rts", Seq("info"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap

    val expected = leftRows.map { case (u, ts, tag) =>
      val preceding = rightRows.filter(r => r._1 == u && r._2 <= ts)
      tag -> (if (preceding.isEmpty) None
              else Some(preceding.maxBy(_._2)._3))
    }.toMap
    assert(got === expected)
  }

  test("as-of plan shuffles once on the key, no range-join explosion") {
    val left = Seq(("u1", 5L, "e1")).toDF("user", "ts", "tag")
    val right = Seq(("u1", 4L, "r")).toDF("user", "rts", "info")
    val p = AsOfJoin.asofJoin(left, right, Seq("user"), "ts", "rts",
      Seq("info")).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }
}
