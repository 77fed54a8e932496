package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Association rules against a driver-side recount, plus the rule
  * algebra every (support, confidence, lift) triple must satisfy. */
class BasketSpec extends SparkSpec {

  test("basket rules: top-k equals the textbook recount; algebra holds") {
    val got = BasketQueries.queries("basket_pair_rules")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = items.map(_._1).distinct.length.toLong
    val c1 = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c12 = items.groupBy(_._1).values.toSeq
      .flatMap { b =>
        val is = b.map(_._2).sorted.toSeq
        for (x <- is; y <- is if x < y) yield (x, y)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = c12.toSeq
      .filter(_._2 >= BasketQueries.MinPairBaskets)
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .map { case (a, b, c) =>
        (a, b, c, c1(a), c1(b), c.toDouble / n, c.toDouble / c1(a),
          (c * n).toDouble / (c1(a) * c1(b)))
      }
      .sortBy(x => (-x._8, x._1, x._2))
      .take(BasketQueries.TopK)
    assert(got.toSeq == expected)
    // rule algebra: confidence >= support (c1a <= N), lift symmetric in
    // the pair, and lift = confidence / P(consequent)
    got.foreach { case (_, _, c, c1a, c1b, sup, conf, lift) =>
      assert(conf >= sup)
      assert(sup > 0 && conf <= 1.0)
      assert(lift == (c * n).toDouble / (c1a * c1b))
    }
  }
}
