package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.hash.Fnv1a32.fnv1a32

/** A document flowing through an ingestion stream. */
case class Doc(docId: Long, text: String)

/** Streaming exact deduplication: the first occurrence of each content
  * fingerprint passes, every later duplicate (same batch or any later
  * batch) is suppressed by Spark's keyed dedup state — the streaming twin
  * of `dedup_exact`.
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
      .withColumn("fp", fnv1a32(col("text")))
      .dropDuplicates("fp")
}
