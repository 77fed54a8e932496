package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.BeamSearch

/** The streaming serving twin's parity contract: micro-batched query
  * arrivals walked against the standing graph emit bit-identical rows
  * to the one-shot batch walk, across any batch partitioning, and a
  * replayed batch re-emits identical rows (determinism = idempotence
  * for a stateless serve). */
class BeamServeStreamSpec extends SparkSpec {

  private def rowKey(r: Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))

  test("streamed query micro-batches emit the batch walk's exact rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sample = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 50 === 0 && col("vec_id") < 500)
      .select(col("vec_id").as("q_id"), col("embedding"))
      .as[BeamQueryArrival].collect().sortBy(_.q_id)
    assert(sample.length == 10)

    val emitted = mutable.ArrayBuffer.empty[Row]
    val input = MemoryStream[BeamQueryArrival]
    val q = BeamServeStream.run(spark, sf, input.toDS(),
      b => emitted.synchronized { emitted ++= b.collect() })
    // two uneven micro-batches (3 + 7), then a REPLAY of the first
    input.addData(sample.take(3).toSeq); q.processAllAvailable()
    val afterB1 = emitted.size
    input.addData(sample.drop(3).toSeq); q.processAllAvailable()
    val afterB2 = emitted.size
    input.addData(sample.take(3).toSeq); q.processAllAvailable()
    q.stop()

    val expected = BeamSearch.queries("sim_graph_beam_batch")(spark, sf)
      .collect()
    // batches 1+2 partition the sample: together they must equal the
    // one-shot batch walk exactly
    assert(emitted.take(afterB2).map(rowKey).toSet ==
      expected.map(rowKey).toSet,
      "micro-batched walk diverged from the one-shot batch walk")
    // the replayed batch re-emits exactly the first batch's rows
    assert(emitted.drop(afterB2).map(rowKey).toSet ==
      emitted.take(afterB1).map(rowKey).toSet,
      "replayed micro-batch did not re-emit identical rows")
  }
}
