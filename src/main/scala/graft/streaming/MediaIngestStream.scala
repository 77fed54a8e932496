package graft.streaming

import org.apache.spark.sql.Dataset

import graft.multimodal.{Ppm, Wav, Y4m}

/** A media asset arriving at ingest. */
case class MediaIngest(doc_id: Long, media_type: String,
    payload: Array[Byte])

/** The per-asset validation verdict: parse success plus the container
  * size — what the router needs to send the row to the decode stage or
  * the quarantine. */
case class MediaVerdict(doc_id: Long, media_type: String, ok: Boolean,
    n_bytes: Long)

/** Streaming twin of the batch `media_quarantine` validation: arriving
  * assets are parsed by the REAL codecs ([[Ppm]]/[[Wav]]/[[Y4m]]) as
  * they stream in and stamped with a verdict — the router every ingest
  * front-end runs before anything touches the corpus. Stateless per
  * asset (parsers are pure), so it is a map with no shuffle, no keyed
  * state, and free micro-batch boundaries; at scale the stage is
  * bounded purely by parse throughput × cores.
  *
  * An unknown media type validates against [[Y4m]] — the fallback
  * encoder [[graft.multimodal.Multimodal.mediaAssets]] actually uses
  * for anything that is not image/audio — so no type ever bypasses
  * quarantine unvalidated (same contract as the batch query). */
object MediaIngestStream {

  def verdict(r: MediaIngest): MediaVerdict = {
    val ok = r.media_type match {
      case "image" => Ppm.parse(r.payload).isDefined
      case "audio" => Wav.parse(r.payload).isDefined
      case _ => Y4m.parse(r.payload).isDefined // video + unknown:
      // mediaAssets encodes both as Y4M, so validate with that parser
    }
    MediaVerdict(r.doc_id, r.media_type, ok, r.payload.length.toLong)
  }

  def verdicts(rows: Dataset[MediaIngest]): Dataset[MediaVerdict] = {
    import rows.sparkSession.implicits._
    rows.map(verdict)
  }
}
