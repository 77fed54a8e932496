package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hash.Fnv1a32

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 3
  private val W = 64

  /** Driver-side reference sketch — same hash, same layout. */
  private def refSketch(items: Seq[String]): Array[Long] = {
    val sk = new Array[Long](D * W)
    for (it <- items; r <- 0 until D)
      sk(r * W + (Fnv1a32.hashString(s"$it:$r") % W).toInt) += 1L
    sk
  }

  private def sparkSketch(items: Seq[String], parts: Int): Array[Long] =
    items.toDF("v").repartition(parts)
      .agg(CmsCounts.cmsCounts(col("v"), D, W))
      .first().getSeq[Long](0).toArray

  test("sketch equals a driver-side reference and is partition-invariant") {
    val items = (1 to 5000).map(i => s"item${i % 800}")
    val ref = refSketch(items)
    assert(sparkSketch(items, 1) === ref)
    assert(sparkSketch(items, 13) === ref,
      "merge must be associative/commutative: same sketch at any partitioning")
  }

  test("estimates never underestimate; row sums equal the item count") {
    val items = (1 to 4000).map(i => s"u${i % 300}")
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sk = items.toDF("v")
      .agg(CmsCounts.cmsCounts(col("v"), D, W).as("sk"))
    val est = items.distinct.toDF("v").crossJoin(sk)
      .select(col("v"), CmsCounts.estimate(col("sk"), col("v"), D, W))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated $k: ${est(k)} < $n")
    }
    // every row of the sketch conserves mass: its counters sum to N
    val flat = sk.first().getSeq[Long](0)
    for (r <- 0 until D)
      assert(flat.slice(r * W, (r + 1) * W).sum === items.size.toLong)
  }

  test("estimate is exact when a row has no colliding bucket") {
    // single item: its bucket holds exactly its count in every row
    val items = Seq.fill(123)("only")
    val sk = items.toDF("v")
      .agg(CmsCounts.cmsCounts(col("v"), D, W).as("sk"))
    val est = sk.select(
      CmsCounts.estimate(col("sk"), lit("only"), D, W)).first().getLong(0)
    assert(est === 123L)
  }
}
