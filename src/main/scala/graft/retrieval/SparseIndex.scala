package graft.retrieval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RetrievalQueries._

/** The build/serve split for SPARSE retrieval — the inverted index every
  * 100 TB search stack persists, as [[graft.sim.IvfPqIndex]] is for the
  * dense leg. `ret_bm25_topk` re-tokenizes the corpus on every call
  * (fine as an algorithm exhibit, wrong as a serving architecture); this
  * object tokenizes ONCE at build time and serves queries from the
  * persisted tables alone:
  *
  *   - `postings/` — (term, doc_id, tf), RANGE-PARTITIONED AND SORTED BY
  *     term: a query's `term IN (...)` predicate prunes both parquet
  *     row groups (min/max stats) and whole files — the posting-list
  *     locality of a real inverted index expressed in parquet layout;
  *   - `forward/`  — (doc_id, term, tf) sorted by doc_id: the forward
  *     index used to derive a query-by-example's keywords with a
  *     pushed-down point lookup instead of a corpus scan;
  *   - `dstats/`   — (doc_id, dl) per-document length, doc-sorted;
  *   - `vstats/`   — (term, df) vocabulary stats, term-sorted;
  *   - `cstats/`   — the 1-row (n, tl) corpus totals.
  *
  * Serving reads NOTHING corpus-sized beyond the pruned posting scan:
  * keywords come from the forward point-lookup joined against the
  * vocabulary table, land as LITERAL term predicates on the postings
  * scan, and the scoring chain is the identical integer BM25 of
  * [[RetrievalQueries.sparseTopk]] — so the served lists are
  * bit-identical and share `ret_bm25_topk`'s oracle.
  *
  * Because BM25 has no trained state (unlike IVF-PQ's frozen
  * quantizers), the incremental path is EXACT: the delta tail is
  * tokenized at serve time, posting/stat unions reproduce the full
  * corpus's numbers, and `ret_bm25_incremental` shares the same oracle
  * too.
  */
object SparseIndex {

  def indexPath(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.path(s, dir, "bm25", "documents", "doc_id")

  /** One tokenize pass over `docs`, shaped like the per-query `tf`. */
  private def tokenize(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Tokenize once, persist the five index tables. The postings table is
    * range-partitioned on term and sorted within partitions so serving's
    * `term IN (...)` filter skips files and row groups; the forward
    * table likewise on doc_id. */
  def build(s: SparkSession, dir: String, path: String): Unit = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val t = tokenize(docs).localCheckpoint()
    RetrievalQueries.assertBm25Headroom(s, dir, t)
    t.repartitionByRange(col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings")
    t.repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id", "term")
      .write.mode("overwrite").parquet(s"$path/forward")
    t.groupBy("doc_id").agg(sum("tf").as("dl"))
      .repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$path/dstats")
    t.groupBy("term").agg(count(lit(1)).as("df"))
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/vstats")
    docs.agg(count(lit(1)).as("n"))
      .crossJoin(t.agg(sum("tf").as("tl")))
      .write.mode("overwrite").parquet(s"$path/cstats")
  }

  private val lock = new Object

  def buildIfMissing(s: SparkSession, dir: String): String =
    lock.synchronized {
      val path = indexPath(s, dir)
      if (!new java.io.File(s"$path/cstats/_SUCCESS").exists())
        build(s, dir, path)
      path
    }

  /** BM25 top-k from the persisted index — zero tokenize stages at query
    * time; bit-identical to [[RetrievalQueries.sparseTopk]]. */
  def serve(s: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    val path = buildIfMissing(s, dir)
    serveFrom(s, path,
      s.read.parquet(s"$path/postings"),
      s.read.parquet(s"$path/forward"),
      s.read.parquet(s"$path/dstats"),
      s.read.parquet(s"$path/vstats"),
      s.read.parquet(s"$path/cstats"), k)
  }

  // -- incremental maintenance: exact delta append -------------------------

  /** Base/delta split point — same convention as the IVF-PQ and LSH
    * incremental stories: the newest ~10% of documents play the role of
    * post-build arrivals. */
  def baseCutoff(s: SparkSession, dir: String): Long =
    s.read.parquet(s"$dir/documents.parquet")
      .agg(max("doc_id")).head().getLong(0) * 9 / 10

  /** Build the BASE index over documents up to the cutoff only. */
  def buildBase(s: SparkSession, dir: String, path: String): Unit =
    buildBaseAt(s, dir, path, baseCutoff(s, dir), "")

  /** Cutoff-parametrized base build — `tag` keeps fixed-delta
    * measurement indexes ([[graft.FixedDeltaBench]]) from colliding
    * with the convention-cutoff index (and its headroom memo key). */
  private[graft] def buildBaseAt(s: SparkSession, dir: String,
      path: String, cut: Long, tag: String): Unit = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") <= cut)
    val t = tokenize(docs).localCheckpoint()
    // the base generation serves standalone until the delta arrives —
    // guard it like build() does (ADVICE r8), with the BASE doc count
    RetrievalQueries.assertBm25Headroom(s, dir, t, tag = s"doc_base$tag",
      nCollection = Some(() => docs.count()))
    t.repartitionByRange(col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings")
    t.repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id", "term")
      .write.mode("overwrite").parquet(s"$path/forward")
    t.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(s"$path/dstats")
    t.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/vstats")
    docs.agg(count(lit(1)).as("n"))
      .crossJoin(t.agg(sum("tf").as("tl")))
      .write.mode("overwrite").parquet(s"$path/cstats")
  }

  def buildBaseIfMissing(s: SparkSession, dir: String): String =
    buildBaseIfMissingAt(s, dir, baseCutoff(s, dir), "")

  private[graft] def buildBaseIfMissingAt(s: SparkSession, dir: String,
      cut: Long, tag: String): String =
    lock.synchronized {
      val path = indexPath(s, dir) + s"_base$tag"
      if (!new java.io.File(s"$path/cstats/_SUCCESS").exists())
        buildBaseAt(s, dir, path, cut, tag)
      path
    }

  /** Serve over base + delta: the delta tail (doc_id > cutoff) is
    * tokenized at serve time — the ingest-batch cost — and UNIONED into
    * postings/forward while df/dl/n/tl merge by exact aggregation, so
    * the served lists equal a full rebuild's bit-for-bit (BM25 has no
    * frozen trained state to approximate around). */
  def serveWithDelta(s: SparkSession, dir: String, k: Int = TopK): DataFrame =
    serveWithDeltaAt(s, dir, baseCutoff(s, dir), "", k)

  /** Cutoff-parametrized delta serve — the fixed-delta scale
    * measurement passes cut = maxId − D so the delta is D rows (the
    * production arrival-rate shape) instead of 10% of the corpus. */
  private[graft] def serveWithDeltaAt(s: SparkSession, dir: String,
      cut: Long, tag: String, k: Int = TopK): DataFrame = {
    val path = buildBaseIfMissingAt(s, dir, cut, tag)
    val deltaDocs = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") > cut)
    val dt = tokenize(deltaDocs).localCheckpoint()
    val postings = s.read.parquet(s"$path/postings").unionByName(dt)
    // merged postings = the full corpus's tf rows: check the same bound
    // build() checks, under the same memo key, so the incremental path
    // cannot silently wrap where the full build would refuse (ADVICE r8)
    RetrievalQueries.assertBm25Headroom(s, dir, postings, tag = s"doc$tag")
    val forward = s.read.parquet(s"$path/forward").unionByName(dt)
    val dstats = s.read.parquet(s"$path/dstats")
      .unionByName(dt.groupBy("doc_id").agg(sum("tf").as("dl")))
    // df merges by SUM over the union (a term present in both legs adds)
    val vstats = s.read.parquet(s"$path/vstats")
      .unionByName(dt.groupBy("term").agg(count(lit(1)).as("df")))
      .groupBy("term").agg(sum("df").as("df"))
    val cBase = s.read.parquet(s"$path/cstats")
    val cDelta = deltaDocs.agg(count(lit(1)).as("n_d"))
      .crossJoin(dt.agg(coalesce(sum("tf"), lit(0L)).as("tl_d")))
    val cstats = cBase.crossJoin(cDelta)
      .select((col("n") + col("n_d")).as("n"), (col("tl") + col("tl_d")).as("tl"))
    serveFrom(s, path, postings, forward, dstats, vstats, cstats, k)
  }

  /** Fold the delta tail into a new index GENERATION — the periodic
    * compaction that returns serving to pruned persisted scans only.
    * The base tables are NOT re-tokenized (that is the point of
    * compaction): base postings merge with the freshly-encoded delta by
    * union, stats by exact aggregation. The generation is written to a
    * sibling directory and gated by a final marker created only after
    * ALL five tables landed, so a crash mid-compaction leaves the next
    * call re-running from scratch instead of serving a partial index;
    * the merge is idempotent because base rows are selected by the id
    * range (same discipline as [[graft.sim.IvfPqIndex.compactDelta]]).
    * Because the merge is exact, the compacted generation is
    * bit-identical to a full rebuild — `ret_bm25_compacted` shares
    * `ret_bm25_topk`'s oracle like the other two served paths. */
  def compactDelta(s: SparkSession, dir: String): String = lock.synchronized {
    val base = buildBaseIfMissing(s, dir)
    val path = base + "_compacted"
    val marker = new java.io.File(s"$path/_ALL_TABLES")
    if (!marker.exists()) {
      val cut = baseCutoff(s, dir)
      val dt = tokenize(s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") > cut)).localCheckpoint()
      val merged = s.read.parquet(s"$base/postings")
        .filter(col("doc_id") <= cut) // idempotent: base rows by range
        .unionByName(dt)
        .localCheckpoint()
      // full-corpus stats again after the merge (ADVICE r8) — shares
      // build()'s memo key, so at most one aggregate per corpus
      RetrievalQueries.assertBm25Headroom(s, dir, merged)
      merged.repartitionByRange(col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(s"$path/postings")
      merged.repartitionByRange(col("doc_id"))
        .sortWithinPartitions("doc_id", "term")
        .write.mode("overwrite").parquet(s"$path/forward")
      merged.groupBy("doc_id").agg(sum("tf").as("dl"))
        .write.mode("overwrite").parquet(s"$path/dstats")
      merged.groupBy("term").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$path/vstats")
      s.read.parquet(s"$dir/documents.parquet").agg(count(lit(1)).as("n"))
        .crossJoin(merged.agg(sum("tf").as("tl")))
        .write.mode("overwrite").parquet(s"$path/cstats")
      require(marker.createNewFile(), s"cannot stamp $marker")
    }
    path
  }

  /** Serve AFTER compaction: persisted pruned scans only, no serve-time
    * tokenize of the delta; bit-identical to [[serve]]/[[serveWithDelta]]. */
  def serveCompacted(s: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    val path = compactDelta(s, dir)
    serveFrom(s, path,
      s.read.parquet(s"$path/postings"),
      s.read.parquet(s"$path/forward"),
      s.read.parquet(s"$path/dstats"),
      s.read.parquet(s"$path/vstats"),
      s.read.parquet(s"$path/cstats"), k)
  }

  /** The shared serving tail. `forward` supplies the query docs' term
    * rows (point lookup), `vstats` the df for keyword scoring, then the
    * keyword terms COLLECT into literal predicates for the postings
    * scan (row-group/file pruning — the control-plane fetch is ≤
    * |queries| · [[RetrievalQueries.NumKeywords]] rows). Scoring is the
    * identical reduced integer chain of `sparseTopk`. */
  /** The keyword stage alone: each query doc's [[RetrievalQueries.NumKeywords]]
    * strongest TF-IDF terms, derived from the given forward/vocab/corpus
    * tables (same scoring and tie-break as the exact path). */
  private def keywordsFrom(forward: DataFrame, vstats: DataFrame,
      c: DataFrame): DataFrame = {
    val qf = forward.filter(col("doc_id").isin(QueryDocs: _*))
    val kw = Window.partitionBy("query_doc")
      .orderBy(col("kw_score").desc, col("term"))
    qf.join(vstats, "term") // vocabulary-sized scan, broadcast side is qf
      .crossJoin(broadcast(c))
      .select(col("doc_id").as("query_doc"), col("term"),
        (col("tf").cast("double") * col("n").cast("double") /
          col("df").cast("double")).as("kw_score"))
      .withColumn("krank", row_number().over(kw))
      .filter(col("krank") <= NumKeywords)
      .select("query_doc", "term")
  }

  /** The query docs' keywords from the PERSISTED index tables — exposed
    * for downstream consumers (snippet extraction) that need the terms
    * the served lists were retrieved with. */
  def queryKeywords(s: SparkSession, dir: String): DataFrame = {
    val path = buildIfMissing(s, dir)
    keywordsFrom(s.read.parquet(s"$path/forward"),
      s.read.parquet(s"$path/vstats"),
      s.read.parquet(s"$path/cstats").localCheckpoint())
  }

  private def serveFrom(s: SparkSession, path: String, postings: DataFrame,
      forward: DataFrame, dstats: DataFrame, vstats: DataFrame,
      cstats: DataFrame, k: Int): DataFrame = {
    val c = cstats.localCheckpoint() // 1 row: n, tl
    val keywords = keywordsFrom(forward, vstats, c)
    // literal term predicates -> parquet row-group pruning on postings
    val kwRows = keywords.collect().map(r => (r.getLong(0), r.getString(1)))
    val terms = kwRows.map(_._2).distinct.toSeq
    import s.implicits._
    val kwDf = kwRows.toSeq.toDF("query_doc", "term")
    val w = Window.partitionBy("query_doc")
      .orderBy(col("score_fp").desc, col("doc_id"))
    postings
      .filter(col("term").isin(terms: _*))
      .join(broadcast(kwDf), "term")
      .filter(col("doc_id") =!= col("query_doc"))
      .join(broadcast(vstats.filter(col("term").isin(terms: _*))), "term")
      .join(dstats, "doc_id")
      .crossJoin(broadcast(c))
      .select(col("query_doc"), col("doc_id"),
        expr(RetrievalQueries.bm25ContribExpr("n", "df")).as("c"))
      .groupBy("query_doc", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("c").as("score_fp"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_doc"), col("rank"), col("doc_id"), col("n_terms"),
        col("score_fp"),
        (col("score_fp").cast("double") / lit(Scale.toDouble)).as("score"))
      .orderBy("query_doc", "rank")
  }
}
