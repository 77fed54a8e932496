package graft.text

import graft.SparkSpec

/** Conjunctive-search correctness against a driver-side full scan: the
  * posting-list intersection must return exactly the docs whose token
  * sets contain every query term. */
class SearchSpec extends SparkSpec {

  test("posting intersection == brute-force containment") {
    val terms = TextQueries.SearchTerms.toSet
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .collect()
      .filter(r => terms.subsetOf(r.getAs[String]("text").split(" ").toSet))
      .map(_.getAs[Long]("doc_id"))
      .toSet
    val got = graft.SparkEntry.queries("text_search_terms")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == truth)
    assert(truth.nonEmpty, "fixture should contain conjunctive matches")
  }
}
