package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitLengthSpec extends SparkSpec {
  import BitLength.bitLength64

  test("known-answer vectors, including the zero case conv() gets wrong") {
    import spark.implicits._
    val vectors: Seq[(Long, Int)] = Seq(
      0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3, 255L -> 8, 256L -> 9,
      (1L << 25) -> 26, (1L << 26) - 1 -> 26, Long.MaxValue -> 63,
      -1L -> 64, Long.MinValue -> 64)
    val got = vectors.map(_._1).toDF("x")
      .select(col("x"), bitLength64(col("x")).as("bl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vectors.foreach { case (x, expect) =>
      assert(got(x) === expect, s"bitLength64($x)")
    }
  }

  test("agrees with length(conv(x,10,2)) on every positive 26-bit value class") {
    import spark.implicits._
    // the string route this expression replaces, on the HLL window domain
    val xs = (1 to 1000).map(i => (i * 67109L) % ((1L << 26) - 1) + 1)
    val rows = xs.toDF("x")
      .select(bitLength64(col("x")).as("fast"),
        length(conv(col("x"), 10, 2)).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("null flows through, and the expression stays codegen-compiled") {
    import spark.implicits._
    val got = Seq[java.lang.Long](5L, null).toDF("x")
      .select(bitLength64(col("x")).as("bl")).collect()
    assert(got(0).getInt(0) === 3 && got(1).isNullAt(0))
    // a local Seq constant-folds away; a parquet-backed plan shows the
    // expression running inside WholeStageCodegen
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(bitLength64(col("event_id")).as("bl"))
    df.collect()
    // the `*(n)` stage prefix is the WholeStageCodegen marker: the
    // projection containing the expression must carry it
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("bit_length64")), p.take(1000))
  }
}
