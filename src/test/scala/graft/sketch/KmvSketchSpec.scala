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

  test("kmv_mins is the sorted bottom-k state and merges as set algebra") {
    val k = 16
    def mins(vals: Seq[String]): Seq[Long] =
      vals.toDF("v").agg(KmvDistinct.kmvMins(fnv1a32(col("v")), k))
        .first().getSeq[Long](0)
    val a = (1 to 300).map(i => s"u$i")
    val b = (200 to 500).map(i => s"u$i")
    val (ma, mb) = (mins(a), mins(b))
    // the state is the sorted k smallest distinct hashes
    assert(ma.length === k && ma === ma.sorted && ma.distinct === ma)
    // ALGEBRA: bottom-k of the two states == the union's own sketch —
    // overlap/jaccard/union math needs no second pass over the data
    val merged = (ma ++ mb).distinct.sorted.take(k)
    assert(merged === mins(a ++ b))
    // partition invariance of the state itself
    val p3 = a.toDF("v").repartition(3)
      .agg(KmvDistinct.kmvMins(fnv1a32(col("v")), k)).first().getSeq[Long](0)
    assert(p3 === ma)
  }

  test("cross-day overlap estimates track the exact intersections") {
    val rows = graft.events.EventsQueries
      .queries("events_kmv_overlap")(spark, sf)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (estU, estJ, estO, _) =>
      assert(estU >= 0 && estJ >= 0.0 && estJ <= 1.0)
      assert(math.abs(estO - estU * estJ) < 1e-9)
    }
    // sketch quality: on groups below k the estimate is EXACT; above k
    // the median relative error stays sketch-grade (≈ 1/√k)
    val errs = rows.filter(_._4 > 0)
      .map { case (_, _, estO, exact) => math.abs(estO - exact) / exact }
      .sorted
    assert(errs(errs.length / 2) <= 0.35,
      f"median overlap error ${errs(errs.length / 2)}%.2f too loose")
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
