package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter join pruning — the optimizer feature that matters
  * most at 100 TB shuffle joins: a bloom filter built from the SELECTIVE
  * (filtered-dimension) side is pushed into the fact side's scan-local
  * pipeline, dropping non-matching rows BEFORE they are shuffled. The
  * thresholds here are scaled down to the fixture (production defaults —
  * 10 MB creation side, 10 GB probe scan — are tuned for real clusters);
  * what the test pins is that THIS engine's plans are shaped so the
  * injection applies: a plain shuffle join with a pushable equi-key, no
  * intervening exchange-breaking operator. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim side injects a bloom filter into the fact scan side") {
    val conf = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderdate").between("1995-01-01", "1995-03-31"))
        .select("o_orderkey", "o_custkey")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val rows = joined.collect()
      assert(rows.nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") ||
        plan.contains("BloomFilterMightContain") ||
        plan.contains("bloom_filter"),
        s"no runtime bloom filter on the probe side:\n${plan.take(3000)}")

      // semantics unchanged: same rows with the feature off
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val off = li.join(ord, col("l_orderkey") === col("o_orderkey")).collect()
      assert(rows.map(_.toString).sorted.toSeq ===
        off.map(_.toString).sorted.toSeq)
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
