package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws of the derived partsupp and the queries over it. */
class PartSuppSpec extends SparkSpec {

  test("derivation: 4 distinct suppliers per part, bounded qty and cents") {
    val ps = PartSuppQueries.partsupp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nParts = spark.read.parquet(s"$sf/part.parquet").count()
    val nSupp = spark.read.parquet(s"$sf/supplier.parquet").count()
    assert(ps.length.toLong === nParts * PartSuppQueries.SuppPerPart)
    ps.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.map(_._2).distinct.length === PartSuppQueries.SuppPerPart,
        s"part $p: suppliers must be distinct (consecutive residues)")
    }
    ps.foreach { case (_, sk, qty, cents) =>
      assert(sk >= 1 && sk <= nSupp)
      assert(qty >= 1 && qty <= 9999)
      assert(cents >= 1000 && cents <= 90999)
    }
  }

  test("q2: every returned row carries its part's regional minimum cost") {
    val rows = PartSuppQueries.queries("q2_min_cost_supplier")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // group by part: all winners of one part share one cost
    rows.groupBy(_.getLong(3)).foreach { case (p, rs) =>
      assert(rs.map(_.getDouble(5)).distinct.length === 1,
        s"part $p: tie winners must share the minimum cost")
    }
  }

  test("q11: every kept part exceeds twice the mean part value") {
    val rows = PartSuppQueries.queries("q11_important_stock")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
    }
    // shares of kept parts each exceed 2/n where n = parts with stock
    val shares = rows.map(_.getDouble(2))
    assert(shares.max === shares.head, "ordered by value desc")
  }

  test("q9 full: profit = revenue − cost exactly, per output row") {
    val rows = PartSuppQueries.queries("q9_profit_full")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) === r.getDouble(2) - r.getDouble(3),
        s"${r.getString(0)}/${r.getLong(1)}: profit must be the exact difference")
    }
  }
}
