package graft.sim

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted kNN-graph contract: every served path (edge scan, PPR,
  * hard negatives, incremental, compacted) is bit-identical to its exact
  * per-query twin, serving derives no pairs at query time, and the
  * bucket-local delta story is exact including the MaxPosting cap flip.
  */
class KnnGraphIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("served kNN edges are bit-identical to sim_knn_join") {
    val exact = rows(SimilarityQueries.queries("sim_knn_join")(spark, sf))
    assert(rows(KnnGraphIndex.serveKnnJoin(spark, sf)) == exact)
  }

  test("served PPR equals ret_graph_ppr — the persisted graph IS the " +
      "per-call graph") {
    val exact = rows(SimilarityQueries.queries("ret_graph_ppr")(spark, sf))
    assert(rows(KnnGraphIndex.servePpr(spark, sf)) == exact)
  }

  test("served hard negatives equal sim_hard_negatives") {
    val exact =
      rows(SimilarityQueries.queries("sim_hard_negatives")(spark, sf))
    assert(rows(KnnGraphIndex.serveHardNegatives(spark, sf)) == exact)
  }

  test("incremental serve (base + touched-bucket recompute) equals the " +
      "full pair set exactly, and the delta leg is non-vacuous") {
    val full = rows(SimilarityQueries.knnTopK(
      SimilarityQueries.bucketCosinePairs(spark, sf)).orderBy("vec_id", "rk"))
    val inc = rows(SimilarityQueries.knnTopK(
      KnnGraphIndex.pairsWithDelta(spark, sf)).orderBy("vec_id", "rk"))
    assert(inc == full)
    val cut = KnnGraphIndex.baseCutoff(spark, sf)
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") > cut)
    assert(delta.count() > 0, "fixture must have a delta tail")
    // the recompute leg actually fires: the delta tail touches ≥1 bucket
    // that the base also populated (otherwise the test proves nothing
    // about the union-of-legs discipline)
    val touched = SimilarityQueries.pairMembers(spark, sf)
      .filter(col("vec_id") > cut).select("bucket").distinct()
    val baseBuckets = SimilarityQueries.pairMembers(spark, sf)
      .filter(col("vec_id") <= cut).select("bucket").distinct()
    assert(touched.join(baseBuckets, "bucket").count() > 0,
      "delta must land in buckets the base populated")
  }

  test("compaction: bit-identical edges, no serve-time pair derivation, " +
      "idempotent re-run across the marker-lost crash window") {
    val exact = rows(SimilarityQueries.queries("sim_knn_join")(spark, sf))
    val compacted = KnnGraphIndex.serveKnnJoinCompacted(spark, sf)
    assert(rows(compacted) == exact)
    val p = compacted.queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet"),
      "compacted serve must not rebucket the corpus:\n" + p.take(2000))
    val path = KnnGraphIndex.compactDelta(spark, sf)
    val n = spark.read.parquet(s"$path/pairs").count()
    assert(new File(s"$path/_ALL_TABLES").delete())
    KnnGraphIndex.compactDelta(spark, sf)
    assert(spark.read.parquet(s"$path/pairs").count() == n,
      "re-compaction must not duplicate pairs")
  }

  test("serving derives nothing at query time: the edge scan reads the " +
      "persisted table only and PPR touches no pair stage") {
    val served = KnnGraphIndex.serveKnnJoin(spark, sf)
    val p = served.queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet"), p.take(2000))
    assert(!p.contains("collect_list"),
      "no posting-list pair stage at serve time:\n" + p.take(2000))
    // PPR's per-iteration frames join the persisted edge list; the plan
    // feeding the first contribution join must be scans, not pair codegen
    val ppr = KnnGraphIndex.servePpr(spark, sf)
    assert(!ppr.queryExecution.executedPlan.toString
      .contains("embeddings.parquet"))
  }

  test("the graph builds once and is reused across serves") {
    val path = KnnGraphIndex.buildIfMissing(spark, sf)
    val marker = new File(s"$path/degrees/_SUCCESS")
    val t0 = marker.lastModified()
    KnnGraphIndex.serveKnnJoin(spark, sf).collect()
    KnnGraphIndex.servePpr(spark, sf).collect()
    assert(marker.lastModified() == t0, "serve must not rebuild the index")
  }
}
