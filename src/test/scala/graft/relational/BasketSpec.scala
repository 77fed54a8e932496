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

  test("sequence rules: temporal census equals the direct recount") {
    val got = BasketQueries.queries("basket_sequence_rules")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("p_brand"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2)))
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_ isBefore _)
    val spans = li.groupBy(e => (e._1, e._2)).view.mapValues { es =>
      (es.map(_._3).min, es.map(_._3).max)
    }.toMap
    val c1 = spans.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val byCust = spans.toSeq.groupBy(_._1._1)
    val seqAll = byCust.values.toSeq.flatMap { members =>
      for {
        ((_, a), (fa, _)) <- members
        ((_, b), (_, lb)) <- members
        if a != b && fa.isBefore(lb)
      } yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = seqAll.toSeq
      .filter(_._2 >= BasketQueries.MinPairBaskets)
      .map { case ((a, b), c) =>
        (a, b, c, seqAll.getOrElse((b, a), 0L), c1(a),
          c.toDouble / c1(a))
      }
      .sortBy(x => (-x._3, x._1, x._2))
      .take(BasketQueries.TopK)
    assert(got.toSeq == expected)
    // confidence is a probability over antecedent holders
    assert(got.forall(r => r._6 > 0.0 && r._6 <= 1.0))
  }
}
