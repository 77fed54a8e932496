package graft

/** Sweeping invariants over the whole driver contract:
  *
  *   - every oracle entry names a registered query (a dangling oracle key
  *     would make the driver's compare fail on a missing result dir);
  *   - every query executes at sf0.001 and returns rows (the driver's
  *     smoke-level check), except the deliberate empty-result queries;
  *   - no query plans a CartesianProduct, except the whitelisted quadratic
  *     oracle baselines (documented as such).
  */
class QuerySweepSpec extends SparkSpec {

  private val mayBeEmpty = Set("kv_point_get_missing")
  // quadratic-by-design oracle baselines (scale path is the LSH variant)
  private val quadraticBaselines =
    Set("dedup_embedding_cosine", "sim_topk_bruteforce", "sim_ann_lsh",
      "sim_ivf_ann",
      // bounded sample × sample by construction (1-in-10 hash sample)
      "sim_cosine_calibration")

  test("oracle keys are a subset of query keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query runs at sf0.001, returns rows, and avoids cartesian plans") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf)
          val plan = df.queryExecution.executedPlan.toString
          val cartesian = plan.contains("CartesianProduct") &&
            !quadraticBaselines.contains(name)
          val n = df.count()
          val empty = n == 0 && !mayBeEmpty.contains(name)
          if (cartesian) Some(s"$name: CartesianProduct in plan")
          else if (empty) Some(s"$name: returned 0 rows")
          else None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL is transcendental-free and deterministic") {
    // ln/log/exp round differently across engines (ORACLE.md) and
    // random()/now() break replay — none may appear in any oracle.
    // This lint runs over the ACTUAL shipped SQL, not the source text,
    // so comments and method names can't false-positive.
    val banned = Seq("ln(", "log(", "log2(", "log10(", "exp(",
      "pow(", "power(", "random(", "now(", "current_date", "getdate")
    val hits = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      val l = sql.toLowerCase
      banned.filter(l.contains).map(b => s"$name uses $b")
    }
    assert(hits.isEmpty, hits.mkString("\n"))
  }
}
