package graft.profile

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The profiler's stats against hand-computed truth on a frame with the
  * pathologies the fixture lacks: nulls, duplicate values, and mixed
  * types (stringified uniformly). */
class ProfileSpec extends SparkSpec {

  test("profile counts nulls, distincts, bounds, and lengths exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("aa"), "x"),
      (2L, None, "x"),
      (3L, Some("bbb"), "y"),
      (4L, Some("aa"), "x")
    ).toDF("id", "maybe", "tag")
    val p = ProfileQueries.profile(df, Seq("id", "maybe", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap

    val idRow = p("id")
    assert(idRow.getLong(1) == 4 && idRow.getLong(2) == 0)
    assert(idRow.getLong(3) == 4) // distinct
    assert(idRow.getString(4) == "1" && idRow.getString(5) == "4")
    assert(idRow.getDouble(6) == 1.0)

    val maybeRow = p("maybe")
    assert(maybeRow.getLong(1) == 4 && maybeRow.getLong(2) == 1)
    assert(maybeRow.getLong(3) == 2) // aa, bbb
    assert(maybeRow.getString(4) == "aa" && maybeRow.getString(5) == "bbb")
    assert(maybeRow.getDouble(6) == (2 + 3 + 2) / 3.0)

    val tagRow = p("tag")
    assert(tagRow.getLong(3) == 2 && tagRow.getDouble(6) == 1.0)
  }

  test("fixture profile: key column is unique and null-free") {
    val p = ProfileQueries.queries("profile_documents")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val docId = p("doc_id")
    assert(docId.getLong(2) == 0, "doc_id has nulls")
    assert(docId.getLong(1) == docId.getLong(3), "doc_id not unique")
    assert(p.keySet == ProfileQueries.DocCols.toSet)
  }

  test("constraint suite: one scan, verdicts match hand-derived truth") {
    val df = ProfileQueries.queries("profile_constraints")(spark, sf)
    // single-pass shape: exactly one FileScan in the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).length == 1, plan.take(2000))

    val rows = df.collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getString(3), r.getBoolean(4)))
      .toMap
    // fixture truths: unique non-null ids, whitelisted langs, n_chars
    // consistent with text — these constraints must PASS
    for (c <- Seq("doc_id_complete", "doc_id_unique", "lang_in_domain",
        "n_chars_consistent", "n_chars_max", "source_complete")) {
      assert(rows(c)._4, s"$c should pass: ${rows(c)}")
    }
    // the deliberately-failing gate: docs under 100 chars exist and push
    // compliance below 0.95 — a checker that can't fail proves nothing
    val (metric, thr, cmp, passed) = rows("text_min_100_chars")
    assert(cmp == "ge" && thr == 0.95)
    assert(metric < 1.0, "fixture has sub-100-char docs")
    assert(!passed, s"text_min_100_chars should fail: metric=$metric")
    // verdict column is derived from (metric, threshold, cmp) — re-derive
    rows.foreach { case (name, (m, t, c, p)) =>
      val expect = if (c == "ge") m >= t else m <= t
      assert(p == expect, s"$name verdict inconsistent")
    }
  }

  test("events profile: one row per column, ids fully distinct, ts in µs") {
    val rows = ProfileQueries.queries("profile_events")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet === ProfileQueries.EventCols.toSet)
    val n = rows("event_id")._1
    assert(rows.values.forall(_._1 == n), "every column sees every row")
    assert(rows("event_id")._3 === n, "event_id must be fully distinct")
    assert(rows.values.forall(_._2 == 0L), "fixture has no nulls")
    // the stringified ts must be 16-digit µs, not 19-digit ns
    val tsMin = ProfileQueries.queries("profile_events")(spark, sf)
      .filter(col("col_name") === "ts").head().getString(4)
    assert(tsMin.length === 16, s"ts profile not in µs: $tsMin")
  }

  test("drift: self-diff is zero; the half-drop diff flags only real shifts") {
    val rows = ProfileQueries.queries("profile_drift")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(rows.keySet === ProfileQueries.DocCols.toSet)
    rows.foreach { case (c, (nd, dd, ld, drifted)) =>
      assert(nd === 0.0, s"$c: fixture has no nulls — null drift must be 0")
      val expect = math.abs(nd) > ProfileQueries.DriftNullTol ||
        math.abs(dd) > ProfileQueries.DriftDistinctTol ||
        math.abs(ld) > ProfileQueries.DriftLenTol
      assert(drifted === expect, s"$c: verdict inconsistent with deltas")
    }
    // doc_id's distinct ratio is 1 in both halves — it cannot drift
    assert(rows("doc_id")._2 === 0.0)
  }

  test("embeddings profile: clean fixture scores clean; norms sane") {
    val m = ProfileQueries.queries("profile_embeddings")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count().toDouble
    assert(m("n_rows") == n)
    // the fixture ships healthy vectors: every violation counter is 0
    Seq("n_null_vec", "n_wrong_dim", "n_with_nan", "n_zero_vec",
      "n_dup_ids").foreach(k => assert(m(k) == 0.0, k))
    // norm quantiles are positive and ordered
    assert(m("norm_p50") > 0.0 && m("norm_p50") <= m("norm_p99"))
  }
}
