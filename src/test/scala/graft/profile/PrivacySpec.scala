package graft.profile

import graft.SparkSpec

/** The privacy audits against a driver-side class census and the
  * monotonicity laws generalization must obey. */
class PrivacySpec extends SparkSpec {

  private lazy val cust: Seq[(Int, Double, String)] =
    spark.read.parquet(s"$sf/customer.parquet")
      .select("c_nationkey", "c_acctbal", "c_mktsegment")
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSeq

  test("k-anonymity: scorecard equals the direct class census") {
    val r = PrivacyQueries.queries("privacy_k_anonymity")(spark, sf)
      .collect().head
    val classes = cust
      .groupBy(c => (c._1, math.floor(c._2 / PrivacyQueries.BalWidth).toLong))
      .values.toSeq
    val small = classes.filter(_.size < PrivacyQueries.KAnon)
    assert(r.getLong(0) == cust.size.toLong)
    assert(r.getLong(1) == classes.size.toLong)
    assert(r.getLong(2) == classes.map(_.size).min.toLong)
    assert(r.getLong(3) == small.size.toLong)
    assert(r.getLong(4) == small.map(_.size).sum.toLong)
    assert(r.getLong(5) == classes.count(c =>
      c.size >= PrivacyQueries.KAnon &&
        c.map(_._3).distinct.size < PrivacyQueries.LDiv).toLong)
    assert(r.getDouble(6) == small.map(_.size).sum.toDouble / cust.size)
    // the audit has teeth on the fixture: some classes violate k
    assert(r.getLong(3) > 0)
  }

  test("generalization ladder: coarser buckets never suppress more") {
    val rows = PrivacyQueries
      .queries("privacy_generalization_ladder")(spark, sf)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == PrivacyQueries.LadderWidths)
    // every level sees the whole table
    assert(rows.forall(_._2 == cust.size.toLong))
    // coarsening merges classes: class count non-increasing, suppressed
    // rows non-increasing up the ladder
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._3 <= a._3 && b._4 <= a._4; case _ => true
    })
  }
}
