package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A document flowing through an ingestion stream. */
case class Doc(docId: Long, text: String)

/** Streaming exact deduplication: the first occurrence of each content
  * fingerprint passes, every later duplicate (same batch or any later
  * batch) is suppressed by Spark's keyed dedup state — the streaming twin
  * of `dedup_exact`, and like it keyed on 128-bit md5 (a 32-bit
  * fingerprint would birthday-collide within ~77 K documents and silently
  * DROP a distinct document on every collision — at ingest scale, data
  * loss, not dedup).
  *
  * State is per-fingerprint and hash-partitioned; in production add
  * `withWatermark` on an event-time column so fingerprint state ages out
  * instead of growing with the corpus (`dropDuplicatesWithinWatermark`),
  * trading unbounded-history dedup for bounded state — the standard
  * 100 TB ingestion compromise.
  */
object DedupStream {

  def firstOccurrence(docs: Dataset[Doc]): DataFrame =
    docs.toDF()
      .withColumn("fp", md5(col("text").cast("binary")))
      .dropDuplicates("fp")
}
