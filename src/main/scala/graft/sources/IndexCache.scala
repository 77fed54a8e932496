package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cache-key discipline for the persisted build/serve artifacts
  * (IVF-PQ index, LSH dedup index, BPE tokenizer) under
  * `target/graft_index`.
  *
  * Two failure modes of a path-only key, both closed here:
  *
  *   1. STALENESS — the index is a deterministic function of the corpus,
  *      but a fixture regenerated in place keeps its path, so a key made
  *      only of the sanitized path would keep serving the old index while
  *      the DuckDB oracles (which always read the current files) move on.
  *      The key therefore embeds a cheap corpus fingerprint — row count +
  *      max id, one metadata-cheap aggregate per corpus per process —
  *      so a changed corpus lands on a fresh directory and triggers a
  *      rebuild. (Count+max is a screen, not a cryptographic guarantee:
  *      an in-place edit that preserves both would slip through; for the
  *      generated fixtures, regeneration reseeds ids/rows.)
  *   2. COLLISION — `replaceAll("[^A-Za-z0-9._-]", "_")` maps `/a/b` and
  *      `/a_b` to the same name. The key embeds an FNV-1a hash of the
  *      RAW path, so sanitized twins stay separate.
  */
object IndexCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fnv32(s: String): Long = {
    var h = 2166136261L
    s.getBytes("UTF-8").foreach { b =>
      h = ((h ^ (b & 0xffL)) * 16777619L) & 0xffffffffL
    }
    h
  }

  /** `<fnv(dir)>_<rows>_<maxId>` for `dir/table.parquet` — computed once
    * per (table, dir) per process, then served from memory. */
  def fingerprint(s: SparkSession, dir: String, table: String,
      idCol: String): String =
    cache.computeIfAbsent(s"$table|$dir", _ => {
      val r = s.read.parquet(s"$dir/$table.parquet")
        .agg(count(lit(1)), max(col(idCol))).head()
      f"${fnv32(dir)}%08x_${r.get(0)}_${r.get(1)}"
    })

  /** Index directory for one artifact family: sanitized path for human
    * legibility, fingerprint for correctness. */
  def path(s: SparkSession, dir: String, family: String, table: String,
      idCol: String): String =
    s"target/graft_index/${family}_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_").stripPrefix("_") +
      "_" + fingerprint(s, dir, table, idCol)
}
