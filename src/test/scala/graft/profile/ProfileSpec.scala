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
}
