package graft.keyspace

import scala.util.Random

import graft.SparkSpec

/** Property test: on randomized op logs, the distributed LWW compaction
  * must agree with an imperative reference fold of the store semantics
  * (Put overwrites, Delete removes, highest seq wins).
  */
class CompactionLawSpec extends SparkSpec {

  test("compaction law holds on 200 random op logs") {
    import spark.implicits._
    val rnd = new Random(42)
    val keys = Seq("a", "b", "c", "d", "e")

    val ops = (0 until 200).flatMap { sample =>
      val n = 1 + rnd.nextInt(12)
      // random distinct seqs, random keys/ops/values
      rnd.shuffle((1 to 30).toList).take(n).map { seq =>
        val key = s"$sample:${keys(rnd.nextInt(keys.length))}"
        if (rnd.nextBoolean())
          (seq.toLong, "put", key, s"v${rnd.nextInt(100)}")
        else (seq.toLong, "delete", key, null: String)
      }
    }

    // imperative reference: apply ops per key in seq order
    val expected = ops.groupBy(_._3).flatMap { case (key, ks) =>
      val last = ks.maxBy(_._1)
      if (last._2 == "put") Some(key -> last._4) else None
    }

    val got = KvLog.compact(ops.toDF("seq", "op", "key", "value"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    assert(got === expected)
  }

  test("incremental base+delta compaction equals the full recompaction") {
    val full = KvLog.state(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val incremental = KvLog.incrementalState(spark, sf)
    val inc = incremental
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(inc === full)
    // the split is real: some winners come from each side of the seam
    val sides = incremental.groupBy("from_delta").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(sides.getOrElse(true, 0L) > 0, "no delta-side winners — split degenerate")
    assert(sides.getOrElse(false, 0L) > 0, "no base-side winners — split degenerate")
  }
}
