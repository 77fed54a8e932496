package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32.fnv1a32

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(df: org.apache.spark.sql.DataFrame, k: Int): Double =
    df.agg(KmvDistinct.kmvDistinct(fnv1a32(col("v")), k)).first().getDouble(0)

  test("below k distinct values the count is exact") {
    val df = (1 to 40).map(i => s"x${i % 17}").toDF("v")
    assert(estimate(df, 64) === 17.0)
  }

  test("estimate is partition-invariant and within 20% on 10k distinct") {
    val vals = (1 to 10000).map(i => s"user:$i")
    val a = estimate(vals.toDF("v").repartition(3), 256)
    val b = estimate(vals.toDF("v").repartition(11), 256)
    assert(a === b, "merge must be associative/commutative: same estimate " +
      "regardless of partitioning")
    assert(math.abs(a - 10000.0) / 10000.0 < 0.2, s"estimate $a too far off")
  }

  test("duplicates do not move the estimate") {
    val base = (1 to 500).map(i => s"k$i")
    val once = estimate(base.toDF("v"), 64)
    val dup = estimate((base ++ base ++ base).toDF("v"), 64)
    assert(once === dup)
  }

  test("the aggregate runs in Structured Streaming and equals the batch sketch") {
    // mergeable fixed-size state is exactly what a streaming aggregation
    // needs; the same TypedImperativeAggregate drives both modes
    implicit val sqlCtx = spark.sqlContext
    val vals = (1 to 3000).map(i => s"u${i % 700}")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = input.toDF().select(col("value").as("v"))
      .agg(KmvDistinct.kmvDistinct(fnv1a32(col("v")), 64).as("est"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    for (chunk <- vals.grouped(1000)) { input.addData(chunk); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("kmv_stream").first().getDouble(0)
    val batch = estimate(vals.toDF("v"), 64)
    assert(streamed === batch)
  }
}
