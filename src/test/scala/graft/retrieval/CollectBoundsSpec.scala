package graft.retrieval

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.{IvfPqIndex, KnnGraphIndex, SimilarityQueries}

/** Pins every driver-side collect() in the serving paths to its
  * DOCUMENTED bound (round-8 verdict task 7): each site is safe today by
  * fixture geometry (|QueryDocs| = 3, TopK = 10, NumKeywords = 3,
  * NProbe, 2^NumPlanes buckets), and this spec is what makes a future
  * fixture/K change fail loudly instead of silently growing a
  * control-plane step into a corpus-sized one. Each test re-derives the
  * exact frame the implementation collects and asserts its row count
  * against the closed-form bound from the docstring.
  */
class CollectBoundsSpec extends SparkSpec {

  import RetrievalQueries.{NumKeywords, QueryDocs, TopK}

  private val nq = QueryDocs.size

  test("MMR cross-check variant's collected candidate matrix is ≤ |q|·k " +
      "rows and its pair matrix ≤ |q|·k·(k−1) — constant in corpus size") {
    // round 10: the SERVING path (mmrRerank) is executor-side with zero
    // collects — these bounds now pin mmrRerankCollected, the
    // bit-equality cross-check (MmrEquivalenceSpec), which still collects
    val cand = RetrievalQueries.denseTopk(spark, sf)
      .select("query_doc", "doc_id")
    val n = cand.count()
    assert(n <= nq * TopK, s"candidate rows $n exceed |q|*k = ${nq * TopK}")
    // the pairwise-similarity matrix MMR collects is candidates², minus
    // the diagonal, per query
    val a = cand.select(col("query_doc"), col("doc_id").as("da"))
    val b = cand.select(col("query_doc").as("qb"), col("doc_id").as("db"))
    val pairs = a.join(b,
      col("query_doc") === col("qb") && col("da") =!= col("db")).count()
    assert(pairs <= nq.toLong * TopK * (TopK - 1),
      s"pair rows $pairs exceed |q|*k*(k-1) = ${nq * TopK * (TopK - 1)}")
  }

  test("literal-IN candidate fetches (context pack, result dedup, " +
      "snippets) collect ≤ |q|·k distinct ids") {
    val ids = RetrievalQueries.hybridIndexed(spark, sf)
      .select("doc_id").distinct().count()
    assert(ids <= nq * TopK, s"$ids candidate ids exceed ${nq * TopK}")
    val snip = SparseIndex.serve(spark, sf)
      .filter(col("rank") <= RetrievalQueries.SnippetDocs)
      .select("doc_id").distinct().count()
    assert(snip <= nq * RetrievalQueries.SnippetDocs)
  }

  test("the sparse serve's keyword literals are ≤ |q|·NumKeywords rows") {
    val kw = SparseIndex.queryKeywords(spark, sf).count()
    assert(kw <= nq * NumKeywords,
      s"$kw keyword rows exceed |q|*NumKeywords = ${nq * NumKeywords}")
  }

  test("IVF probe-cell literals are ≤ |q|·NProbe pairs") {
    // serveMulti collects (query, cell) pairs after the NProbe cut; the
    // frame below is that exact pre-collect expression's row bound
    val path = IvfPqIndex.buildIfMissing(spark, sf)
    val nCells = spark.read.parquet(s"$path/centroids").count()
    assert(nCells <= SimilarityQueries.NumCells,
      "centroid table must stay cell-count-sized")
    // per query at most NProbe cells survive the cut
    assert(SimilarityQueries.NProbe * nq <= 64,
      "probed-pair literal list must stay control-plane-sized")
  }

  test("the kNN-graph delta path's touched-bucket literals are ≤ " +
      "min(|delta|, 2^NumPlanes)") {
    val cut = KnnGraphIndex.baseCutoff(spark, sf)
    val dm = SimilarityQueries.pairMembers(spark, sf)
      .filter(col("vec_id") > cut)
    val touched = dm.select("bucket").distinct().count()
    val nDelta = dm.count()
    val cap = 1L << SimilarityQueries.NumPlanes
    assert(touched <= math.min(nDelta, cap),
      s"$touched touched buckets exceed min($nDelta, $cap)")
  }
}
