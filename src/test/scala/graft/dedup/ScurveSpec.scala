package graft.dedup

import graft.SparkSpec

/** Structural laws of the LSH s-curve calibration view. */
class ScurveSpec extends SparkSpec {

  private lazy val rows =
    graft.SparkEntry.queries("dedup_lsh_scurve")(spark, sf).collect()

  test("rates are probabilities and bin means sit inside their bins") {
    assert(rows.nonEmpty)
    for (r <- rows) {
      def d(n: String) = r.getDouble(r.fieldIndex(n))
      val (bin, nPairs, nCollide) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (measured, sMid) = (d("measured_rate"), d("s_mid"))
      val (theory, sMean, theoryMean) =
        (d("theory_rate"), d("s_mean"), d("theory_mean"))
      assert(bin >= 0 && bin <= 9)
      assert(nCollide >= 0 && nCollide <= nPairs)
      assert(measured >= 0.0 && measured <= 1.0)
      assert(theory >= 0.0 && theory <= 1.0)
      assert(theoryMean >= 0.0 && theoryMean <= 1.0)
      assert(math.abs(sMid - (bin + 0.5) / 10.0) < 1e-12)
      // bin 9 also holds jaccard == 1.0 exactly, hence <= upper INclusive
      assert(sMean >= bin / 10.0 && sMean <= (bin + 1) / 10.0)
    }
  }

  test("collision rate is monotone across observed bins (s-curve shape)") {
    val byBin = rows.sortBy(_.getLong(0)).map(_.getDouble(3))
    assert(byBin.zip(byBin.tail).forall { case (lo, hi) => lo <= hi })
  }

  test("high-similarity pairs all collide; the verified LSH dedup agrees") {
    // every pair the thresholded LSH dedup emits was, by construction,
    // generated from a band collision — so the measured rate in the bins
    // those pairs land in can never be 0
    val lsh = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect()
    val hot = rows.filter(_.getLong(0) >= 5)
    if (lsh.nonEmpty) {
      assert(hot.map(_.getLong(2)).sum >= lsh.length,
        "fewer band collisions than verified LSH pairs")
    }
  }
}
