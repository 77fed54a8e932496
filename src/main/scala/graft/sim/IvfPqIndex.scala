package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SimilarityQueries._

/** The build/serve split every 100 TB vector store has — and the one
  * piece the per-query `sim_*` ANN paths deliberately skip: those
  * retrain centroids and codebooks on every call (fine for an oracle-
  * checked algorithm exhibit, wrong as a serving architecture). This
  * object PERSISTS the IVF-PQ index once and serves queries from the
  * persisted tables alone:
  *
  *   - `centroids/`  — the [[SimilarityQueries.NumCells]]-row coarse
  *     quantizer (cell, c_emb);
  *   - `codebooks/`  — the PqM·PqK product-quantizer codewords
  *     (sub, cluster, c);
  *   - `codes/`      — one row per (vector, subspace): (vec_id, sub,
  *     cluster), parquet PARTITIONED BY the coarse `cell`, so a probe
  *     of `nprobe` cells file-prunes to `nprobe/NumCells` of the
  *     corpus before a byte is read — the posting-list layout of a
  *     disk-resident IVF index (same partition-pruning contract as
  *     [[graft.keyspace.PartitionedLayout]]).
  *
  * Serving reads NOTHING corpus-sized: the query embedding is a
  * pushed-down point lookup, the probed cells are a ≤ NumCells-row
  * control-plane fetch (collected so the codes scan gets LITERAL
  * partition predicates), the LUT is a 32-row broadcast, and the ADC
  * top-k runs over the pruned code partitions as one TakeOrdered. At
  * 100 TB the only scaling knobs are NumCells (more, smaller
  * partitions) and the code width — the dataflow is fixed.
  *
  * Because build is a deterministic function of the corpus, serving
  * from the persisted index returns bit-identical results to the
  * retrain-per-query `sim_ivfpq_ann` — the served query shares that
  * query's DuckDB oracle.
  */
object IvfPqIndex {

  /** Index root for a fixture directory (one index per corpus, cached
    * across queries and processes under target/). The key embeds a
    * corpus fingerprint — see [[graft.sources.IndexCache]] — so a
    * regenerated fixture rebuilds instead of serving stale centroids. */
  def indexPath(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.path(s, dir, "ivfpq", "embeddings", "vec_id")

  /** Train (coarse cells + PQ codebooks) and persist the three index
    * tables. One corpus read per Lloyd iteration — the same training
    * dataflow as the per-query path, run ONCE. */
  def build(s: SparkSession, dir: String, path: String): Unit = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val centroids = coarseCentroids(e)
    val assigned = assignedCells(e).select("vec_id", "cell")
    // loop-invariant input to every pqCodebooks Lloyd round → the
    // mode-selectable materialization, like the loop's own rounds
    val sv = pqSubVecs(e.select("vec_id", "embedding"))
      .transform(graft.Materialize(_))
    val cb = pqCodebooks(sv)
    val codes = pqAssign(sv, cb).select("vec_id", "sub", "cluster")
      .join(assigned, "vec_id")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    cb.write.mode("overwrite").parquet(s"$path/codebooks")
    codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes")
  }

  private val lock = new Object

  /** Build exactly once per corpus per process; later calls (and later
    * processes — the layout lives under target/) reuse the files. */
  def buildIfMissing(s: SparkSession, dir: String): String = lock.synchronized {
    val path = indexPath(s, dir)
    val done = new java.io.File(s"$path/codes/_SUCCESS")
    if (!done.exists()) build(s, dir, path)
    path
  }

  // -- incremental maintenance: frozen-quantizer delta append -------------

  /** Base/delta split point: the newest ~10% of vectors play the role
    * of post-build arrivals. Integer math (`* 9 / 10`) so the oracle's
    * `max(vec_id) * 9 // 10` lands on the same id. */
  def baseCutoff(s: SparkSession, dir: String): Long =
    s.read.parquet(s"$dir/embeddings.parquet")
      .agg(max("vec_id")).head().getLong(0) * 9 / 10

  /** Nearest-cell assignment against a GIVEN centroid table (the
    * persisted one) — same scoring and tie-break as
    * [[SimilarityQueries.assignedCells]], which derives its centroids
    * inline. */
  private def assignCellsWith(e: DataFrame, centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos_c").desc, col("cell"))
    e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cell"),
        cosine(col("embedding"), col("c_emb")).as("cos_c"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"))
  }

  /** Build the BASE index: quantizers trained on vectors up to the
    * cutoff only, codes stored for those vectors only — the state an
    * index is in when new data starts arriving. */
  def buildBase(s: SparkSession, dir: String, path: String): Unit = {
    // a fresh base is by definition un-compacted: the generation marker
    // lives INSIDE codes/, which the overwrite below wipes (the legacy
    // top-level marker is deleted defensively for old on-disk layouts)
    new java.io.File(s"$path/COMPACTED").delete()
    val cut = baseCutoff(s, dir)
    val base = s.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") <= cut)
    val centroids = coarseCentroids(base)
    val sv = pqSubVecs(base.select("vec_id", "embedding"))
      .transform(graft.Materialize(_))
    val cb = pqCodebooks(sv)
    val codes = pqAssign(sv, cb).select("vec_id", "sub", "cluster")
      .join(assignCellsWith(base, centroids), "vec_id")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    cb.write.mode("overwrite").parquet(s"$path/codebooks")
    codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes")
  }

  def buildBaseIfMissing(s: SparkSession, dir: String): String =
    lock.synchronized {
      val path = indexPath(s, dir) + "_base"
      val done = new java.io.File(s"$path/codes/_SUCCESS")
      if (!done.exists()) buildBase(s, dir, path)
      path
    }

  /** Encode post-cutoff arrivals with the index's FROZEN quantizers —
    * no retraining, the operation an index runs on every ingest batch.
    * Returns (vec_id, sub, cluster, cell) rows shaped like the
    * persisted codes table. */
  def deltaCodes(s: SparkSession, dir: String, path: String): DataFrame = {
    val cut = baseCutoff(s, dir)
    val delta = s.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") > cut)
    val centroids = s.read.parquet(s"$path/centroids")
    val codebooks = s.read.parquet(s"$path/codebooks")
    pqAssign(pqSubVecs(delta.select("vec_id", "embedding")), codebooks)
      .select("vec_id", "sub", "cluster")
      .join(assignCellsWith(delta, centroids), "vec_id")
  }

  /** Serve over base + un-compacted delta: the persisted codes still
    * file-prune on cell; the delta tail is encoded with the frozen
    * quantizers and unioned in — the standard serving shape between
    * index rebuilds. Top-k can and does surface delta vectors. */
  def serveWithDelta(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val path = buildBaseIfMissing(s, dir)
    val codes = s.read.parquet(s"$path/codes")
      .select("vec_id", "sub", "cluster", "cell")
      .unionByName(deltaCodes(s, dir, path))
    serveFrom(s, dir, path, codes, k)
  }

  /** Marker file recording that a codes generation already contains the
    * folded delta. It lives INSIDE the generation directory ("_" prefix
    * so Spark's parquet reader ignores it, like _SUCCESS) and is created
    * BEFORE the swap, so the rename moves data and marker atomically
    * together — there is no crash window in which a compacted table can
    * be mistaken for an un-compacted one (ADVICE r7). */
  val GenMarker = "_COMPACTED_GEN"

  /** Fold the delta tail into the partitioned codes table — the
    * periodic compaction that returns serving to a single pruned scan.
    * Quantizers stay frozen; only `codes/` is rewritten (next
    * generation written beside it, then swapped — never overwrite a
    * table a reader may be scanning).
    *
    * Crash-safe twice over: the [[GenMarker]] travels inside the
    * generation (see above), AND the merge itself is idempotent — base
    * rows are selected by `vec_id <= cutoff` rather than trusting the
    * live table to be delta-free, so even a codes table that somehow
    * already holds delta rows merges to the exact same result. */
  def compactDelta(s: SparkSession, dir: String): String = lock.synchronized {
    val path = buildBaseIfMissing(s, dir)
    if (!new java.io.File(s"$path/codes/$GenMarker").exists()) {
      val cut = baseCutoff(s, dir)
      val merged = s.read.parquet(s"$path/codes")
        .select("vec_id", "sub", "cluster", "cell")
        .filter(col("vec_id") <= cut) // idempotent: base rows by range
        .unionByName(deltaCodes(s, dir, path))
      val next = s"$path/codes_next"
      merged.write.mode("overwrite").partitionBy("cell").parquet(next)
      require(new java.io.File(s"$next/$GenMarker").createNewFile(),
        s"cannot stamp generation marker under $next")
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del)
        f.delete()
      }
      // Swap by renaming the LIVE generation aside first, so there is
      // never a window with no codes table: codes -> codes_old,
      // codes_next -> codes, then drop codes_old. A crash between the
      // two renames leaves codes_old + codes_next, both complete; the
      // _SUCCESS check in buildBaseIfMissing triggers a clean rebuild.
      val live = new java.io.File(s"$path/codes")
      val old = new java.io.File(s"$path/codes_old")
      del(old) // leftover from a previous crash, if any
      require(live.renameTo(old), s"rename-aside failed under $path")
      require(new java.io.File(next).renameTo(live),
        s"generation swap failed under $path")
      del(old)
    }
    path
  }

  /** Serve AFTER compaction: one pruned scan again, results identical
    * to [[serveWithDelta]] (same quantizers, same code set). */
  def serveCompacted(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val path = compactDelta(s, dir)
    serveFrom(s, dir, path,
      s.read.parquet(s"$path/codes").select("vec_id", "sub", "cluster", "cell"),
      k)
  }

  /** Serve top-k ADC neighbors for the stored query vector FROM THE
    * PERSISTED INDEX — zero training stages, zero corpus-embedding
    * scans; bit-identical to `sim_ivfpq_ann`. */
  def serve(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val path = buildIfMissing(s, dir)
    serveFrom(s, dir, path,
      s.read.parquet(s"$path/codes").select("vec_id", "sub", "cluster", "cell"),
      k)
  }

  /** Serve per-query ADC top-k for a SET of stored queries from the
    * persisted index — the fan-in shape a retrieval stack runs (one
    * codes scan shared by all queries, not one scan per query). The
    * probed cells of ALL queries collect into one literal IN filter
    * (static file pruning to the union of probed partitions), a
    * broadcast (query_doc, cell) table restricts each candidate row to
    * the queries that actually probed its cell, and the LUT join keys
    * on (query_doc, sub, cluster). Per-query top-k is a rank window
    * over candidate-sized input. Bit-mirrors
    * [[SimilarityQueries.ivfpqMultiCtes]]. */
  def serveMulti(s: SparkSession, dir: String, queryIds: Seq[Long],
      k: Int): DataFrame = {
    import s.implicits._
    val path = buildIfMissing(s, dir)
    val centroids = s.read.parquet(s"$path/centroids")
    val codebooks = s.read.parquet(s"$path/codebooks")
    val q = s.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_doc"), col("embedding").as("q_emb"))
      .localCheckpoint()
    // per-query probed cells: |queries| × NumCells control-plane rows,
    // collected so the codes scan gets LITERAL partition predicates
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_doc").orderBy(col("cos_c").desc, col("cell"))
    val probedPairs = q.crossJoin(broadcast(centroids))
      .select(col("query_doc"), col("cell"),
        cosine(col("q_emb"), col("c_emb")).as("cos_c"))
      .withColumn("rk", row_number().over(probeW))
      .filter(col("rk") <= NProbe)
      .select("query_doc", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cellsUnion = probedPairs.map(_._2).distinct
    val pairs = probedPairs.toDF("query_doc", "cell")
    // per-query LUTs: |queries| · PqM · PqK rows, broadcast
    val qsv = q.select(col("query_doc"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), j -> " +
          s"struct(CAST(j AS INT) AS sub, " +
          s"slice(q_emb, j * $PqSubDim + 1, $PqSubDim) AS qe))")).as("x"))
      .select(col("query_doc"), col("x.sub").as("sub"), col("x.qe").as("qe"))
    val lut = codebooks.join(broadcast(qsv), "sub")
      .select(col("query_doc"), col("sub"), col("cluster"),
        sqDist(col("qe"), col("c")).as("d"))
    val pivots = (0 until PqM).map(j =>
      max(when(col("sub") === j, col("d"))).as(s"d_$j"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_doc").orderBy(col("adc_dist"), col("vec_id"))
    s.read.parquet(s"$path/codes")
      .select("vec_id", "sub", "cluster", "cell")
      .filter(col("cell").isin(cellsUnion: _*))
      .join(broadcast(pairs), "cell")
      .filter(col("vec_id") =!= col("query_doc"))
      .join(broadcast(lut), Seq("query_doc", "sub", "cluster"))
      .groupBy("query_doc", "vec_id")
      .agg(pivots.head, pivots.tail: _*)
      .select(col("query_doc"), col("vec_id"),
        (0 until PqM).map(j => col(s"d_$j")).reduce(_ + _).as("adc_dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_doc"), col("rank"), col("vec_id").as("doc_id"),
        col("adc_dist"))
      .orderBy("query_doc", "rank")
  }

  /** The shared serving tail: probe cells against the persisted
    * centroids, broadcast the query LUT from the persisted codebooks,
    * ADC top-k over `codes` (the persisted table, or base ∪ delta). */
  private def serveFrom(s: SparkSession, dir: String, path: String,
      codes: DataFrame, k: Int): DataFrame = {
    val centroids = s.read.parquet(s"$path/centroids")
    val codebooks = s.read.parquet(s"$path/codebooks")
    // the query embedding: one pushed-down point lookup, reused by the
    // cell probe and the LUT (checkpointed so it is read once)
    val qEmb = s.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === QueryVec)
      .select(col("embedding").as("q_emb"))
      .localCheckpoint()
    // probed cells as LITERALS: a NumCells-row control-plane fetch —
    // collecting here is what turns the codes read into static file
    // pruning instead of a data-dependent join over every partition
    val probed: Seq[Long] = centroids.crossJoin(qEmb)
      .select(col("cell"), cosine(col("q_emb"), col("c_emb")).as("cos_c"))
      .orderBy(col("cos_c").desc, col("cell")).limit(NProbe)
      .collect().map(_.getLong(0)).toSeq
    // the query's per-subspace LUT: 32 rows, broadcast
    val qsv = qEmb.select(explode(expr(
        s"transform(sequence(0, ${PqM - 1}), j -> " +
          s"struct(CAST(j AS INT) AS sub, " +
          s"slice(q_emb, j * $PqSubDim + 1, $PqSubDim) AS qe))")).as("x"))
      .select(col("x.sub").as("sub"), col("x.qe").as("qe"))
    val lut = codebooks.join(broadcast(qsv), "sub")
      .select(col("sub"), col("cluster"),
        sqDist(col("qe"), col("c")).as("d"))
    val pivots = (0 until PqM).map(j =>
      max(when(col("sub") === j, col("d"))).as(s"d_$j"))
    codes
      .filter(col("cell").isin(probed: _*))
      .filter(col("vec_id") =!= QueryVec)
      .join(broadcast(lut), Seq("sub", "cluster"))
      .groupBy("vec_id")
      .agg(pivots.head, pivots.tail: _*)
      .select(col("vec_id"),
        (0 until PqM).map(j => col(s"d_$j")).reduce(_ + _).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(k)
  }
}
