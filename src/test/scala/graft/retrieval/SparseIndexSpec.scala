package graft.retrieval

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted inverted-index contract: serving is bit-identical to
  * the per-query exact path, reads no corpus text at query time, prunes
  * the postings scan by the literal query terms, builds once, and the
  * incremental path reproduces the full corpus exactly.
  */
class SparseIndexSpec extends SparkSpec {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))

  test("served BM25 lists are bit-identical to the exact per-query path") {
    val exact = RetrievalQueries.sparseTopk(spark, sf)
      .collect().map(key).toSeq
    val served = SparseIndex.serve(spark, sf).collect().map(key).toSeq
    assert(served == exact)
  }

  test("incremental serve (base + delta) equals the full corpus exactly " +
      "— BM25 has no frozen state to approximate around") {
    val exact = RetrievalQueries.sparseTopk(spark, sf)
      .collect().map(key).toSeq
    val inc = SparseIndex.serveWithDelta(spark, sf).collect().map(key).toSeq
    assert(inc == exact)
    // the delta leg is non-vacuous: some documents lie past the cutoff
    val cut = SparseIndex.baseCutoff(spark, sf)
    val nDelta = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") > cut).count()
    assert(nDelta > 0, "fixture must have a delta tail")
  }

  test("compaction folds the delta in: bit-identical results, no " +
      "serve-time tokenize, idempotent re-run") {
    val exact = RetrievalQueries.sparseTopk(spark, sf)
      .collect().map(key).toSeq
    val compacted = SparseIndex.serveCompacted(spark, sf)
    assert(compacted.collect().map(key).toSeq == exact)
    // compacted serving reads persisted tables only
    val p = compacted.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      "compacted serve must not tokenize:\n" + p.take(2000))
    // idempotent: a re-run serves the same generation without growth
    val path = SparseIndex.compactDelta(spark, sf)
    val n = spark.read.parquet(s"$path/postings").count()
    // simulate the marker-lost crash state: compacted data, no marker
    assert(new File(s"$path/_ALL_TABLES").delete())
    SparseIndex.compactDelta(spark, sf)
    assert(spark.read.parquet(s"$path/postings").count() == n,
      "re-compaction must not duplicate postings")
  }

  test("serving reads no corpus text and prunes the postings scan by " +
      "the literal query terms") {
    val df = SparseIndex.serve(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      "no tokenize at query time:\n" + p.take(2000))
    // the keyword terms are collected literals: the postings scan must
    // carry a pushed In(term, ...) filter for row-group pruning
    val postingScanFilter = p.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(postingScanFilter.contains("In(term"),
      "term IN literals must reach the parquet reader:\n" + postingScanFilter)
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("the index builds once and is reused across serves") {
    val path = SparseIndex.buildIfMissing(spark, sf)
    val marker = new File(s"$path/cstats/_SUCCESS")
    val t0 = marker.lastModified()
    SparseIndex.serve(spark, sf).collect()
    SparseIndex.serve(spark, sf).collect()
    assert(marker.lastModified() == t0, "serve must not rebuild the index")
  }
}
