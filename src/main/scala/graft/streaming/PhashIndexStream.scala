package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.multimodal.Multimodal

/** One band row of the perceptual-hash key space: `isProbe = false`
  * REGISTERS a standing-index image under its (band, bv) bucket;
  * `isProbe = true` looks the bucket up without registering. The full
  * (hi, lo) hash travels with the row — 16 bytes — so verification
  * happens inside the bucket group. */
case class PhashKey(band: Int, bv: Long, docId: Long, hi: Long, lo: Long,
    isProbe: Boolean)

/** A VERIFIED near-dup hit: a probe image against a standing-index
  * image within [[Multimodal.PhashHammingMax]] bits. */
case class PhashHit(new_doc: Long, idx_doc: Long, hamming: Long)

/** Streaming twin of `media_phash_neardup`: the standing corpus's
  * visual index lives as KEYED STREAMING STATE — one (docId, hi, lo)
  * posting list per 16-bit band bucket, hash-partitioned and
  * checkpoint-recoverable — so each ingest batch of freshly-decoded
  * images probes (and optionally extends) the index without re-hashing
  * the standing corpus. Unlike the LSH dedup stream (whose shingle sets
  * are too big to carry), the 16-byte hash travels with every posting
  * row, so the hamming VERIFY runs inside the bucket group and the
  * stream emits verified hits, not candidates.
  *
  * Same boundary discipline as every keyed state here: in-batch
  * registrations are not visible to in-batch probes, so results depend
  * on the feed, not intra-batch ordering. Registrations are idempotent
  * under at-least-once replay (posting lists dedup by docId).
  *
  * Emission multiplicity: a hit sharing k of the 4 bands is emitted k
  * times (each bucket is blind to the others) — the batch candidate
  * stage BEFORE its `distinct`, restored downstream with a per-micro-
  * batch batch `distinct` exactly as in [[DedupIndexStream]] (all of a
  * probe's band rows travel in one batch). PhashIndexStreamSpec proves
  * the emitted hit SET equals the brute-force batch gate and pins the
  * multiplicity law; state recovery across restarts is pinned on the
  * same flatMapGroupsWithState machinery by DedupIndexStreamSpec.
  *
  * 100 TB story: state is bounded by corpus size × 4 postings of 24
  * bytes; buckets key a 16-bit value space per band, so the hot path is
  * an O(bucket) scan exactly like the batch band join — never corpus².
  */
object PhashIndexStream {

  val HammingMax: Int = Multimodal.PhashHammingMax

  /** The 4 exact-cover band projections of a (hi, lo) hash — shared
    * with the spec so the feed derivation can't drift from the batch
    * query's `(hash >> 16b) & 0xFFFF` rule. */
  def bandsOf(docId: Long, hi: Long, lo: Long, isProbe: Boolean)
      : Seq[PhashKey] = Seq(
    PhashKey(0, lo & 0xffffL, docId, hi, lo, isProbe),
    PhashKey(1, (lo >> 16) & 0xffffL, docId, hi, lo, isProbe),
    PhashKey(2, hi & 0xffffL, docId, hi, lo, isProbe),
    PhashKey(3, (hi >> 16) & 0xffffL, docId, hi, lo, isProbe))

  private def fn(key: (Int, Long), rows: Iterator[PhashKey],
      state: GroupState[List[(Long, Long, Long)]]): Iterator[PhashHit] = {
    val (probes, regs) = rows.toSeq.partition(_.isProbe)
    val posting = state.getOption.getOrElse(Nil)
    val out = for {
      p <- probes
      (id, ihi, ilo) <- posting
      if id != p.docId
      d = java.lang.Long.bitCount(p.hi ^ ihi) +
        java.lang.Long.bitCount(p.lo ^ ilo)
      if d <= HammingMax
    } yield PhashHit(p.docId, id, d.toLong)
    if (regs.nonEmpty)
      state.update(
        (posting ++ regs.map(r => (r.docId, r.hi, r.lo)))
          .distinctBy(_._1))
    out.iterator
  }

  /** Verified near-dup hits for every probe row against the standing
    * index (multiplicity = shared-band count; `distinct` per
    * micro-batch downstream). */
  def hits(rows: Dataset[PhashKey]): Dataset[PhashHit] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => (r.band, r.bv))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
