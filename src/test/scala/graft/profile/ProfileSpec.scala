package graft.profile

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
}
