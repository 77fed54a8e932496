package graft.functions

import graft.SparkSpec

/** Pins the interpolation formula [[graft.oracle.Ora.pct]] mirrors
  * against Spark's own `percentile` on randomized inputs. Spark's
  * `Percentile.getPercentile` evaluates, for pos = p·(n−1) over the
  * sorted multiset:
  *
  *   - pos integral                      → value at pos
  *   - lowerKey == higherKey (tie run)   → that value, UNinterpolated
  *     (the counts map holds one entry per distinct value, and the
  *     weighted sum of an equal pair can round 1 ulp off the value)
  *   - else (ceil(pos) − pos)·vlo + (pos − floor(pos))·vhi
  *     — the symmetric two-product form, NOT vlo + (vhi − vlo)·frac
  *
  * All three quantile formulations (symmetric, delta, DuckDB's fused
  * quantile_cont) agree mathematically and drift 1 ulp apart in IEEE
  * doubles; the oracle must reproduce Spark's bits exactly, so this
  * spec fails if a Spark upgrade changes the operation order — the
  * signal to update Ora.pct in lockstep. Duplicates are planted to
  * exercise the tie arm (the 10× events fixture is where it first
  * fired for real).
  */
class PctFormulaSpec extends SparkSpec {

  /** Scala reimplementation of the SQL Ora.pct emits. */
  private def pctMirror(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val vlo = sorted(lo)
    val vhi = sorted(math.min(lo + 1, sorted.length - 1))
    if (math.floor(pos) == math.ceil(pos) || vlo == vhi) vlo
    else (math.ceil(pos) - pos) * vlo + (pos - math.floor(pos)) * vhi
  }

  test("Ora.pct's three-arm formula is bit-identical to Spark percentile") {
    import spark.implicits._
    val rng = new scala.util.Random(20260816)
    for (trial <- 1 to 40) {
      val n = 2 + rng.nextInt(60)
      // every third trial draws from a small value pool → dense ties,
      // exercising the lowerKey == higherKey early-out
      val vals = if (trial % 3 == 0)
        IndexedSeq.fill(n)((rng.nextInt(5) * 10 + 100).toDouble / 7.0)
      else IndexedSeq.fill(n)(rng.nextDouble() * 300.0)
      val p = Seq(0.5, 0.9, 0.99, 0.37)(trial % 4)
      val got = vals.toDF("v").selectExpr(s"percentile(v, ${p}D)")
        .head().getDouble(0)
      val want = pctMirror(vals.sorted, p)
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(want),
        s"trial $trial n=$n p=$p: spark=$got mirror=$want")
    }
  }
}
