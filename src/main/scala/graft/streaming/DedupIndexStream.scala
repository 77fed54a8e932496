package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.DedupQueries

/** One band-signature row of the LSH index key space. `isProbe = false`
  * REGISTERS a standing-index document under its (band, sig) bucket;
  * `isProbe = true` looks the bucket up without registering — the two
  * verbs of day-over-day index maintenance. */
case class BandKey(band: Int, sig: String, docId: Long, isProbe: Boolean)

/** A candidate pair from the probe: a new-batch doc against a
  * standing-index doc sharing one band signature. Shape matches the
  * candidate stage of `dedup_lsh_incremental` (pre-verification). */
case class ProbeCand(new_doc: Long, idx_doc: Long)

/** Streaming twin of `dedup_lsh_incremental`: the standing corpus's LSH
  * index lives as KEYED STREAMING STATE — one posting list per
  * (band, sig) bucket, hash-partitioned across executors and
  * checkpoint-recoverable like every keyed state here — so each ingest
  * batch probes (and optionally extends) the index without ever
  * re-deriving it. Registrations accumulate across micro-batches;
  * probes see the index as of the previous batch close (the same
  * boundary discipline as the watermark queries: in-batch registrations
  * are not visible to in-batch probes, so results depend on the feed,
  * not on intra-batch ordering).
  *
  * The [[DedupQueries.MaxPosting]] cap carries over with batch-identical
  * semantics: a bucket past the cap emits nothing (the batch form drops
  * the whole posting list). State per bucket is bounded by the cap + the
  * overflow beyond it; at 100 TB the bucket count scales with corpus
  * size while each stays O(cap).
  *
  * Emission multiplicity: a pair sharing k band signatures is emitted k
  * times (each (band, sig) group is blind to the others) — the stream
  * is the batch candidate stage BEFORE its `.distinct()`. All of a
  * probe doc's band rows travel in one ingest batch (they derive from
  * one doc row), so the downstream verification job dedups per micro-
  * batch with a plain batch `distinct` — no cross-batch dedup state is
  * ever needed. DedupIndexStreamSpec proves the emitted candidate SET
  * equals the batch derivation ([[DedupQueries.incrementalCandidates]])
  * exactly, across multi-batch index loads, and pins the per-band
  * multiplicity law.
  */
object DedupIndexStream {

  val MaxPosting: Int = DedupQueries.MaxPosting

  private def fn(key: (Int, String), rows: Iterator[BandKey],
      state: GroupState[List[Long]]): Iterator[ProbeCand] = {
    val (probes, regs) = rows.toSeq.partition(_.isProbe)
    val ids = state.getOption.getOrElse(Nil)
    // batch contract: an over-cap bucket is excluded entirely, and an
    // empty bucket has nothing to pair against
    val out =
      if (ids.nonEmpty && ids.size <= MaxPosting)
        for (p <- probes; i <- ids) yield ProbeCand(p.docId, i)
      else Nil
    // distinct: an at-least-once source can replay a registration batch;
    // a doubled posting entry would double every future probe pair
    if (regs.nonEmpty)
      state.update((ids ++ regs.map(_.docId)).distinct)
    out.iterator
  }

  /** Candidate pairs for every probe row against the standing index.
    * Downstream, candidates go through the same exact-Jaccard
    * verification as the batch query (candidates are a superset of true
    * near-dups by construction — banding only affects recall). */
  def candidates(rows: Dataset[BandKey]): Dataset[ProbeCand] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
