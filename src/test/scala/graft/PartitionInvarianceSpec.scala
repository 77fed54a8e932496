package graft

/** Partition-count invariance: the 100 TB contract behind every float in
  * this engine is that results do not depend on HOW the data was split —
  * different executor counts, AQE decisions, or speculative re-runs must
  * produce bit-identical answers. The ORACLE.md rules (decimal money
  * sums, ordered folds, integer-derived ratios) exist exactly for this;
  * here the claim is tested directly: a cross-family sample of queries
  * runs under shuffle.partitions = 3 and = 7 and must collect byte-equal
  * row sets, floats included.
  */
class PartitionInvarianceSpec extends SparkSpec {

  // float-heavy and shuffle-heavy representatives of each family —
  // the queries where partition-order sensitivity would surface first
  private val sample = Seq(
    "q1_pricing_summary",        // decimal money sums
    "q9_profit_full",            // revenue − derived cost, two sum kinds
    "events_trend_forecast",     // OLS over BIGINT moments
    "events_ks_values",          // ECDF walk + sqrt critical value
    "events_value_quantiles",    // interpolated percentiles
    "text_tfidf_keywords",       // ratio scores + top-k windows
    "dedup_ngram_jaccard",       // posting-list pair chain
    "graph_source_modularity",   // exact rationals over a pair graph
    "sim_label_centroids",       // fixed-point centroid means
    "embed_covariance",          // fixed-point second moments
    "kv_shard_stats",            // keyspace compaction + rollup
    "corpus_dsir_weights",       // smoothed ratio means on the 2^-20 grid
    "ret_bm25_topk",             // integer BM25 chain + rank windows
    "ret_ndcg_eval",             // RRF doubles + fixed-point DCG
    "ret_hybrid_indexed",        // both persisted-index serving legs
    "ret_passage_topk",          // chunk-granularity chain + MaxP windows
    "ret_mmr_rerank",            // greedy argmax over collected doubles
    "ret_context_pack",          // prefix-sum budget over served lists
    "media_phash_neardup",       // banded join + hamming verify
    "sim_centroid_outliers",     // quantized-cosine bottom-k
    "ret_graph_ppr",             // rounded float PPR iterations
    "ret_filtered_dense",        // facet join + cosine ranking
    "ret_passage_served")        // persisted chunk-index serving

  private def collectAll(partitions: String): Map[String, Seq[String]] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try sample.map { name =>
      val rows = SparkEntry.queries(name)(spark, sf).collect()
        .map(_.toSeq.map {
          // bit-level float identity, not tolerance
          case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
          case f: Float  => java.lang.Float.floatToRawIntBits(f).toString
          case x         => String.valueOf(x)
        }.mkString("|")).toSeq
      name -> rows
    }.toMap
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("a cross-family sample is bit-identical under 3 vs 7 shuffle partitions") {
    val at3 = collectAll("3")
    val at7 = collectAll("7")
    for (name <- sample) {
      assert(at3(name).nonEmpty, s"$name returned no rows")
      assert(at3(name) === at7(name),
        s"$name: result depends on the shuffle partition count — " +
          "a partition-order-sensitive float leaked in")
    }
  }
}
