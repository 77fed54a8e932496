package graft.retrieval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RetrievalQueries._

/** The build/serve split for PASSAGE retrieval — [[SparseIndex]]'s
  * discipline applied to the chunk-granularity index a long-document
  * RAG stack actually serves from. `ret_passage_topk` re-tokenizes the
  * corpus positionally on every call (the algorithm exhibit); this
  * object tokenizes ONCE at build time and persists:
  *
  *   - `postings/` — (term, doc_id, chunk, tf), term-range-sorted so a
  *     query's `term IN (...)` literals prune files and row groups;
  *   - `forward/`  — the DOC-level (doc_id, term, tf) table (a doc's
  *     chunk tfs summed — exact, windows don't overlap), doc-sorted:
  *     the point-lookup source for query-by-example keywords;
  *   - `cdstats/`  — (doc_id, chunk, dl) per-chunk lengths;
  *   - `vstats/`   — (term, df_doc, df_chunk): BOTH granularities of
  *     df, doc-level for keyword scoring, chunk-level for BM25;
  *   - `cstats/`   — the 1-row (n_docs, n_chunks, tl) totals.
  *
  * Serving reads nothing corpus-sized beyond the pruned postings scan
  * and reruns the identical integer chain + MaxP of
  * [[RetrievalQueries.passageTopk]], so the served lists are
  * bit-identical and share `ret_passage_topk`'s oracle.
  */
object PassageIndex {

  def indexPath(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.path(s, dir, "passage", "documents", "doc_id")

  /** One positional tokenize, five persisted tables. */
  def build(s: SparkSession, dir: String, path: String): Unit = {
    val ct = chunkTf(s, dir) // checkpointed (doc_id, chunk, term, tf)
    assertBm25Headroom(s, dir, ct, tag = "chunk",
      nCollection = Some(() =>
        ct.select("doc_id", "chunk").distinct().count()))
    val tDoc = ct.groupBy("doc_id", "term").agg(sum("tf").as("tf"))
      .localCheckpoint()
    ct.repartitionByRange(col("term"))
      .sortWithinPartitions("term", "doc_id", "chunk")
      .write.mode("overwrite").parquet(s"$path/postings")
    tDoc.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id", "term")
      .write.mode("overwrite").parquet(s"$path/forward")
    ct.groupBy("doc_id", "chunk").agg(sum("tf").as("dl"))
      .repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id", "chunk")
      .write.mode("overwrite").parquet(s"$path/cdstats")
    tDoc.groupBy("term").agg(count(lit(1)).as("df_doc"))
      .join(ct.groupBy("term").agg(count(lit(1)).as("df_chunk")), "term")
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/vstats")
    s.read.parquet(s"$dir/documents.parquet")
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(ct.agg(
        countDistinct(col("doc_id"), col("chunk")).as("n_chunks")))
      .crossJoin(ct.agg(sum("tf").as("tl")))
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

  /** Passage top-k with MaxP from the persisted index — zero tokenize
    * stages at query time; bit-identical to
    * [[RetrievalQueries.passageTopk]]. */
  def serve(s: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    val path = buildIfMissing(s, dir)
    serveFrom(s,
      s.read.parquet(s"$path/postings"),
      s.read.parquet(s"$path/forward"),
      s.read.parquet(s"$path/cdstats"),
      s.read.parquet(s"$path/vstats"),
      s.read.parquet(s"$path/cstats"), k)
  }

  // -- incremental maintenance: exact delta append (SparseIndex's
  // -- lifecycle at chunk granularity; BM25 has no trained state, so
  // -- every merge below is exact and all served paths share the
  // -- passage oracle) ------------------------------------------------

  /** Build the BASE index over documents up to [[SparseIndex.baseCutoff]]
    * only — the same newest-10%-arrive-later convention as every other
    * incremental story here. */
  def buildBase(s: SparkSession, dir: String, path: String): Unit =
    buildBaseAt(s, dir, path, SparseIndex.baseCutoff(s, dir), "")

  /** Cutoff-parametrized base build — `tag` keeps fixed-delta
    * measurement indexes ([[graft.FixedDeltaBench]]) from colliding
    * with the convention-cutoff index (and its headroom memo key). */
  private[graft] def buildBaseAt(s: SparkSession, dir: String,
      path: String, cut: Long, tag: String): Unit = {
    val baseDocs = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") <= cut)
    val ct = chunkTfOf(baseDocs)
    // guard the standalone base generation like build() (ADVICE r8)
    assertBm25Headroom(s, dir, ct, tag = s"chunk_base$tag",
      nCollection = Some(() =>
        ct.select("doc_id", "chunk").distinct().count()))
    val tDoc = ct.groupBy("doc_id", "term").agg(sum("tf").as("tf"))
      .localCheckpoint()
    ct.repartitionByRange(col("term"))
      .sortWithinPartitions("term", "doc_id", "chunk")
      .write.mode("overwrite").parquet(s"$path/postings")
    tDoc.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id", "term")
      .write.mode("overwrite").parquet(s"$path/forward")
    ct.groupBy("doc_id", "chunk").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(s"$path/cdstats")
    tDoc.groupBy("term").agg(count(lit(1)).as("df_doc"))
      .join(ct.groupBy("term").agg(count(lit(1)).as("df_chunk")), "term")
      .write.mode("overwrite").parquet(s"$path/vstats")
    baseDocs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(ct.agg(
        countDistinct(col("doc_id"), col("chunk")).as("n_chunks")))
      .crossJoin(ct.agg(sum("tf").as("tl")))
      .write.mode("overwrite").parquet(s"$path/cstats")
  }

  def buildBaseIfMissing(s: SparkSession, dir: String): String =
    buildBaseIfMissingAt(s, dir, SparseIndex.baseCutoff(s, dir), "")

  private[graft] def buildBaseIfMissingAt(s: SparkSession, dir: String,
      cut: Long, tag: String): String =
    lock.synchronized {
      val path = indexPath(s, dir) + s"_base$tag"
      if (!new java.io.File(s"$path/cstats/_SUCCESS").exists())
        buildBaseAt(s, dir, path, cut, tag)
      path
    }

  /** The delta tail's tables, tokenized at serve time (the ingest-batch
    * cost). Chunks are per-document, so base and delta posting/length
    * rows are disjoint and union IS the merge; df and the corpus totals
    * merge by exact addition. */
  def serveWithDelta(s: SparkSession, dir: String, k: Int = TopK)
      : DataFrame =
    serveWithDeltaAt(s, dir, SparseIndex.baseCutoff(s, dir), "", k)

  /** Cutoff-parametrized delta serve — the fixed-delta scale
    * measurement passes cut = maxId − D so the delta is D rows (the
    * production arrival-rate shape) instead of 10% of the corpus. */
  private[graft] def serveWithDeltaAt(s: SparkSession, dir: String,
      cut: Long, tag: String, k: Int = TopK): DataFrame = {
    val path = buildBaseIfMissingAt(s, dir, cut, tag)
    val deltaDocs = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") > cut)
    val dt = chunkTfOf(deltaDocs)
    val dtDoc = dt.groupBy("doc_id", "term").agg(sum("tf").as("tf"))
      .localCheckpoint()
    val postings = s.read.parquet(s"$path/postings").unionByName(dt)
    // merged postings = the full corpus's chunk tf rows — same bound and
    // memo key as build(), so the incremental path is guarded too
    // (ADVICE r8)
    assertBm25Headroom(s, dir, postings, tag = s"chunk$tag",
      nCollection = Some(() =>
        postings.select("doc_id", "chunk").distinct().count()))
    val forward = s.read.parquet(s"$path/forward").unionByName(dtDoc)
    val cdstats = s.read.parquet(s"$path/cdstats")
      .unionByName(dt.groupBy("doc_id", "chunk").agg(sum("tf").as("dl")))
    val vstats = s.read.parquet(s"$path/vstats")
      .unionByName(
        dtDoc.groupBy("term").agg(count(lit(1)).as("df_doc"))
          .join(dt.groupBy("term").agg(count(lit(1)).as("df_chunk")),
            "term"))
      .groupBy("term").agg(sum("df_doc").as("df_doc"),
        sum("df_chunk").as("df_chunk"))
    val cDelta = deltaDocs.agg(count(lit(1)).as("n_docs_d"))
      .crossJoin(dt.agg(coalesce(
        countDistinct(col("doc_id"), col("chunk")), lit(0L))
        .as("n_chunks_d")))
      .crossJoin(dt.agg(coalesce(sum("tf"), lit(0L)).as("tl_d")))
    val cstats = s.read.parquet(s"$path/cstats").crossJoin(cDelta)
      .select((col("n_docs") + col("n_docs_d")).as("n_docs"),
        (col("n_chunks") + col("n_chunks_d")).as("n_chunks"),
        (col("tl") + col("tl_d")).as("tl"))
    serveFrom(s, postings, forward, cdstats, vstats, cstats, k)
  }

  /** Fold the delta into a compacted GENERATION — gated by a marker
    * created only after all five tables landed, and idempotent because
    * base rows are re-selected by the id range (the IvfPq/SparseIndex
    * compaction discipline). The merge is exact, so the compacted
    * generation serves bit-identically to a full rebuild. */
  def compactDelta(s: SparkSession, dir: String): String = lock.synchronized {
    val base = buildBaseIfMissing(s, dir)
    val path = base + "_compacted"
    val marker = new java.io.File(s"$path/_ALL_TABLES")
    if (!marker.exists()) {
      val cut = SparseIndex.baseCutoff(s, dir)
      val dt = chunkTfOf(s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") > cut))
      val merged = s.read.parquet(s"$base/postings")
        .filter(col("doc_id") <= cut) // idempotent: base rows by range
        .unionByName(dt)
        .localCheckpoint()
      // full-corpus chunk stats after the merge (ADVICE r8)
      assertBm25Headroom(s, dir, merged, tag = "chunk",
        nCollection = Some(() =>
          merged.select("doc_id", "chunk").distinct().count()))
      val mDoc = merged.groupBy("doc_id", "term").agg(sum("tf").as("tf"))
        .localCheckpoint()
      merged.repartitionByRange(col("term"))
        .sortWithinPartitions("term", "doc_id", "chunk")
        .write.mode("overwrite").parquet(s"$path/postings")
      mDoc.repartitionByRange(col("doc_id"))
        .sortWithinPartitions("doc_id", "term")
        .write.mode("overwrite").parquet(s"$path/forward")
      merged.groupBy("doc_id", "chunk").agg(sum("tf").as("dl"))
        .write.mode("overwrite").parquet(s"$path/cdstats")
      mDoc.groupBy("term").agg(count(lit(1)).as("df_doc"))
        .join(merged.groupBy("term").agg(count(lit(1)).as("df_chunk")),
          "term")
        .write.mode("overwrite").parquet(s"$path/vstats")
      s.read.parquet(s"$dir/documents.parquet")
        .agg(count(lit(1)).as("n_docs"))
        .crossJoin(merged.agg(
          countDistinct(col("doc_id"), col("chunk")).as("n_chunks")))
        .crossJoin(merged.agg(sum("tf").as("tl")))
        .write.mode("overwrite").parquet(s"$path/cstats")
      require(marker.createNewFile(), s"cannot stamp $marker")
    }
    path
  }

  /** Serve AFTER compaction: persisted pruned scans only, no serve-time
    * tokenize; bit-identical to [[serve]]/[[serveWithDelta]]. */
  def serveCompacted(s: SparkSession, dir: String, k: Int = TopK)
      : DataFrame = {
    val path = compactDelta(s, dir)
    serveFrom(s,
      s.read.parquet(s"$path/postings"),
      s.read.parquet(s"$path/forward"),
      s.read.parquet(s"$path/cdstats"),
      s.read.parquet(s"$path/vstats"),
      s.read.parquet(s"$path/cstats"), k)
  }

  /** The shared serving tail over whatever table set the caller
    * assembled (persisted, base+delta union, or compacted). */
  private def serveFrom(s: SparkSession, postings: DataFrame,
      forward: DataFrame, cdstats: DataFrame, vstats: DataFrame,
      cstats: DataFrame, k: Int): DataFrame = {
    val c = cstats.localCheckpoint() // 1 row
    // keywords: forward point-lookup × doc-level df — same rational
    // tf·N/df scoring and (score, term) tie-break as the exact path
    val kw = Window.partitionBy("query_doc")
      .orderBy(col("kw_score").desc, col("term"))
    val keywords = forward
      .filter(col("doc_id").isin(QueryDocs: _*))
      .join(vstats, "term")
      .crossJoin(broadcast(c))
      .select(col("doc_id").as("query_doc"), col("term"),
        (col("tf").cast("double") * col("n_docs").cast("double") /
          col("df_doc").cast("double")).as("kw_score"))
      .withColumn("krank", row_number().over(kw))
      .filter(col("krank") <= NumKeywords)
      .select("query_doc", "term")
    // literal term predicates → row-group/file pruning on postings
    val kwRows = keywords.collect().map(r => (r.getLong(0), r.getString(1)))
    val terms = kwRows.map(_._2).distinct.toSeq
    import s.implicits._
    val kwDf = kwRows.toSeq.toDF("query_doc", "term")
    val wBest = Window.partitionBy("query_doc", "doc_id")
      .orderBy(col("chunk_fp").desc, col("chunk"))
    val wTop = Window.partitionBy("query_doc")
      .orderBy(col("chunk_fp").desc, col("doc_id"))
    postings
      .filter(col("term").isin(terms: _*))
      .join(broadcast(kwDf), "term")
      .filter(col("doc_id") =!= col("query_doc"))
      .join(broadcast(vstats.filter(col("term").isin(terms: _*))), "term")
      .join(cdstats, Seq("doc_id", "chunk"))
      .crossJoin(broadcast(c))
      .select(col("query_doc"), col("doc_id"), col("chunk"),
        expr(RetrievalQueries.bm25ContribExpr("n_chunks", "df_chunk"))
          .as("c"))
      .groupBy("query_doc", "doc_id", "chunk")
      .agg(count(lit(1)).as("n_terms"), sum("c").as("chunk_fp"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_doc"), col("rank"), col("doc_id"), col("chunk"),
        col("n_terms"), col("chunk_fp"),
        (col("chunk_fp").cast("double") / lit(Scale.toDouble)).as("score"))
      .orderBy("query_doc", "rank")
  }
}
