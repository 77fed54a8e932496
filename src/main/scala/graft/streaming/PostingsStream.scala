package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One row of the inverted-index key space. `isProbe = false` REGISTERS
  * (doc, tf) under the term's posting list — the ingest verb;
  * `isProbe = true` reads the term's current posting list without
  * registering — the serving verb (`probeId` tags which query asked, so
  * multi-query probes come back attributable). */
case class TermKey(term: String, docId: Long, tf: Long, isProbe: Boolean,
    probeId: Long)

/** A served posting row: query `probe_id` asked for `term`, the standing
  * index answered (doc_id, tf) — the exact input shape of the BM25
  * scoring chain in [[graft.retrieval.SparseIndex]]. */
case class PostingHit(probe_id: Long, term: String, doc_id: Long, tf: Long)

/** Streaming twin of [[graft.retrieval.SparseIndex]]'s ingest/serve
  * split: the standing inverted index lives as KEYED STREAMING STATE —
  * one posting list per term, hash-partitioned across executors by the
  * state store and checkpoint-recoverable — so each ingest batch extends
  * the index and each probe batch reads posting lists without ever
  * re-tokenizing the standing corpus.
  *
  * Boundary discipline matches the other index streams
  * ([[DedupIndexStream]]): registrations become visible at batch close,
  * so probes see the index as of the previous batch — results depend on
  * the feed, not on intra-batch ordering. Replay safety: an
  * at-least-once source can re-deliver a registration batch; postings
  * dedup by doc_id on update (last tf wins, matching the batch
  * tokenizer's one-row-per-(doc, term) invariant).
  *
  * Scale shape: state per term is O(posting list), the same as the
  * persisted layout — the state store's term-hash partitioning is the
  * distribution a 100 TB deployment needs, with the usual production
  * caveat that stopword-grade hot terms get split or stoplisted before
  * reaching the index (true of the batch layout too).
  * PostingsStreamSpec proves the served posting SET equals the batch
  * index's pruned postings scan exactly, across multi-batch loads and
  * a kill-and-recover cycle.
  */
object PostingsStream {

  private def fn(term: String, rows: Iterator[TermKey],
      state: GroupState[Map[Long, Long]]): Iterator[PostingHit] = {
    val (probes, regs) = rows.toSeq.partition(_.isProbe)
    val postings = state.getOption.getOrElse(Map.empty)
    val out = for {
      p <- probes
      (doc, tf) <- postings
    } yield PostingHit(p.probeId, term, doc, tf)
    if (regs.nonEmpty)
      state.update(postings ++ regs.map(r => r.docId -> r.tf))
    out.iterator
  }

  /** Posting rows for every probe against the standing index. */
  def serve(rows: Dataset[TermKey]): Dataset[PostingHit] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.term)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
