package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HITS against a plain-Scala replay of the rounded, max-normalized
  * iteration, plus the mutual-endorsement laws. */
class HitsSpec extends SparkSpec {

  test("hits: scores equal the textbook replay; endorsement laws hold") {
    val got = HitsQueries.queries("graph_hits")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.length == 2 * HitsQueries.TopK)
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")),
        concat(lit("s:"), col("l_suppkey")))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    def r12(v: Double): Double =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var hub = edges.map(_._1).distinct.map(_ -> 1.0).toMap
    var auth = Map.empty[String, Double]
    val bySupp = edges.groupBy(_._2)
    val byCust = edges.groupBy(_._1)
    for (_ <- 1 to HitsQueries.Iterations) {
      val aRaw = bySupp.view.mapValues(es =>
        r12(es.map(e => hub(e._1)).sum)).toMap
      val aMax = aRaw.values.max
      auth = aRaw.view.mapValues(v => r12(v / aMax)).toMap
      val hRaw = byCust.view.mapValues(es =>
        r12(es.map(e => auth(e._2)).sum)).toMap
      val hMax = hRaw.values.max
      hub = hRaw.view.mapValues(v => r12(v / hMax)).toMap
    }
    val expA = auth.toSeq.sortBy(x => (-x._2, x._1))
      .take(HitsQueries.TopK).map { case (n, s) => ("authority", n, s) }
    val expH = hub.toSeq.sortBy(x => (-x._2, x._1))
      .take(HitsQueries.TopK).map { case (n, s) => ("hub", n, s) }
    // scores compare at 1e-9: the driver replay sums in map order while
    // the engine sums in partition order — the 12 dp rounding absorbs
    // the difference for the ORACLE (same rounded value), and here we
    // allow the same slack explicitly
    (got.filter(_._1 == "authority") zip expA).foreach {
      case ((_, gn, gs), (_, en, es)) =>
        assert(gn == en); assert(math.abs(gs - es) < 1e-9)
    }
    (got.filter(_._1 == "hub") zip expH).foreach {
      case ((_, gn, gs), (_, en, es)) =>
        assert(gn == en); assert(math.abs(gs - es) < 1e-9)
    }
    // normalization: the top score of each role is exactly 1
    assert(got.filter(_._1 == "authority").map(_._3).max == 1.0)
    assert(got.filter(_._1 == "hub").map(_._3).max == 1.0)
    // scores are in (0, 1]
    assert(got.forall(r => r._3 > 0.0 && r._3 <= 1.0))
  }
}
