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

  test("the EMITTED Ora.pct SQL string bit-matches Spark and the mirror") {
    // The first test pins pctMirror (a Scala re-implementation) against
    // Spark; this one executes the SQL STRING Ora.pct actually emits, so
    // drift in the emission itself (the DECIMAL-literal cast pitfall, the
    // rn/least clamping) is caught at unit level, not only at the
    // integration gate. The string is DuckDB-dialect only in its
    // `p::DOUBLE` cast — shimmed to CAST(p AS DOUBLE), which yields the
    // same double bits — and otherwise valid Spark SQL evaluated over the
    // same rkd (rn, n) scaffold the oracles build. Both engines ignore
    // NULLs in min() and share IEEE-754 semantics, so bit-equality here
    // transfers to DuckDB as long as the operation ORDER in the string is
    // what both engines execute — which is exactly what the string pins.
    import spark.implicits._
    val rng = new scala.util.Random(20260817)
    for (trial <- 1 to 20) {
      val n = 2 + rng.nextInt(60)
      val vals = if (trial % 3 == 0)
        IndexedSeq.fill(n)((rng.nextInt(5) * 10 + 100).toDouble / 7.0)
      else IndexedSeq.fill(n)(rng.nextDouble() * 300.0)
      val pStr = Seq("0.5", "0.9", "0.99", "0.37")(trial % 4)
      val emitted = graft.oracle.Ora.pct("v", pStr)
        .replace(s"$pStr::DOUBLE", s"CAST($pStr AS DOUBLE)")
      vals.toDF("v").createOrReplaceTempView("pct_vals")
      val fromSql = spark.sql(
        s"""SELECT ($emitted) AS q FROM (
           |  SELECT v, row_number() OVER (ORDER BY v) AS rn,
           |         count(*) OVER () AS n
           |  FROM pct_vals
           |) GROUP BY n""".stripMargin).head().getDouble(0)
      val fromSpark = vals.toDF("v")
        .selectExpr(s"percentile(v, ${pStr}D)").head().getDouble(0)
      val fromMirror = pctMirror(vals.sorted, pStr.toDouble)
      def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
      assert(bits(fromSql) === bits(fromSpark) &&
        bits(fromSql) === bits(fromMirror),
        s"trial $trial n=$n p=$pStr: sql=$fromSql spark=$fromSpark " +
          s"mirror=$fromMirror")
    }
  }
}
