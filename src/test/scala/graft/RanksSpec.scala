package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the two-stage rank helper against the single-partition window
  * it replaces: same bits, no unpartitioned WindowExec over the input.
  * The three board queries that use it (events_rfm_segments,
  * corpus_shard_plan, text_zipf_head's limit-first cousin) are oracle-
  * gated end-to-end; this spec isolates the helper so a future edit
  * cannot drift it without a direct signal.
  */
class RanksSpec extends SparkSpec {

  /** Adversarial shape: heavy ties on the payload (forcing the unique
    * tiebreak to matter), skewed values, and a row count that does not
    * divide the partition count. */
  private def fixture = {
    import spark.implicits._
    (1L to 997L).map(i => (i, (i * 7919) % 13, s"p${i % 5}"))
      .toDF("id", "v", "grp")
  }

  test("rowNumber equals the global window's row_number bit-for-bit") {
    val df = fixture
    val got = Ranks.rowNumber(df, "rk", col("v").desc, col("id").asc)
      .select("id", "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rk", row_number()
        .over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select("id", "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("rowNumber plans no unpartitioned WindowExec") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = Ranks.rowNumber(fixture, "rk", col("v").asc, col("id").asc)
      .queryExecution.sparkPlan
    val naked = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(naked.isEmpty,
      s"two-stage rank must not single-partition-sort:\n$plan")
  }

  test("ntileFromRank equals ntile(k) for every remainder class") {
    import spark.implicits._
    // n mod k sweeps 0..3 (997, 996, 995, 994 rows) so both formula
    // branches and the uneven-bucket boundary are all exercised
    for (n <- 994L to 997L) {
      val df = (1L to n).toDF("id")
      val want = df.withColumn("q",
          ntile(4).over(Window.orderBy("id")).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = df
        .withColumn("rk", col("id")) // id IS the rank under orderBy(id)
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
        .withColumn("q", Ranks.ntileFromRank(col("rk"), col("n"), 4))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === want, s"n=$n")
    }
  }

  test("ntileFromRank survives the degenerate n < k case") {
    import spark.implicits._
    val df = (1L to 3L).toDF("id")
    val got = df
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
      .withColumn("q", Ranks.ntileFromRank(col("id"), col("n"), 4))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // SQL ntile with n < k: row i gets bucket i
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
