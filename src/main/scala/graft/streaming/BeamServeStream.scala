package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sim.{BeamSearch, KnnGraphIndex}

/** A query vector arriving at the serving tier. */
case class BeamQueryArrival(q_id: Long, embedding: Seq[Float])

/** Streaming SERVING twin of the batch graph-ANN walk
  * ([[graft.sim.BeamSearch]] `sim_graph_beam_batch`): query vectors
  * arrive as a micro-batch stream, and each micro-batch walks the
  * STANDING persisted kNN graph through the exact batch code path
  * (`beamBatchOver`) inside `foreachBatch` — the request-stream half of
  * the build/serve split, next to [[AnnIngestStream]]'s ingest half.
  *
  * Statelessness is the design point: the walk reads only the frozen
  * edge/embedding tables, holds no keyed state, and queries are
  * independent (no cross-query interaction inside a walk), so
  *   - any partition of a query set into micro-batches emits
  *     bit-identical per-query rows to the one-shot batch walk
  *     (spec-pinned with ==), and
  *   - replays after failure re-emit identical rows (determinism is the
  *     idempotence story; there is no state to recover).
  *
  * At 100 TB the per-micro-batch cost is |batch| walks, each touching
  * ≤ hops·beam·(KnnK+1) vectors via literal-IN pruned lookups — arrival
  * rate, never corpus size, prices the stream.
  */
object BeamServeStream {

  /** Run the serving stream over `queries`, appending each micro-batch's
    * walked top-K to `sink` (a driver-side collector in tests; a real
    * sink in production). Returns the started query. */
  def run(s: SparkSession, dir: String, queries: Dataset[BeamQueryArrival],
      sink: DataFrame => Unit): StreamingQuery = {
    val path = KnnGraphIndex.buildIfMissing(s, dir)
    val edges = s.read.parquet(s"$path/edges").select("vec_id", "nbr")
    queries.toDF()
      .select(col("q_id"), col("embedding").as("q_emb"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(BeamSearch.beamBatchOver(s, dir, edges, batch))
      }
      .start()
  }
}
