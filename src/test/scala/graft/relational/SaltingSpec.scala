package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of probe rows share one key — the pathological case
    val big = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k$i" else "hot", i.toLong)
    }.toDF("k", "v")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B"))
      .toDF("k", "label")

    val plain = big.join(small, Seq("k")).select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    val salted = Salting.saltedJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(salted === plain)
    assert(plain.count(_._1 == "hot") === 1800)
  }

  test("salt spreads the hot key across buckets") {
    val big = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val buckets = big.withColumn("_salt",
        pmod(hash(col("k"), col("v")), lit(8)))
      .groupBy("_salt").count().collect()
    assert(buckets.length === 8)
    assert(buckets.map(_.getLong(1)).max < 500, "no bucket holds half the key")
  }

  test("AQE splits the skewed sort-merge join at runtime (the other rescue)") {
    // Salting's scaladoc claims AQE's skew-join handles the sort-merge
    // case without code changes — prove it on this engine's config. One
    // key owns ~50% of a 40k-row probe side; with the skew thresholds
    // scaled to the fixture, the final adaptive plan must mark the join
    // skew-split, and results must equal the non-adaptive join.
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(0, 40000).select(
        when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(997L)))
          .as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 997).select(col("id").as("k"),
        concat(lit("lbl"), col("id")).as("label"))
      val joined = big.join(dim, Seq("k"))
      // collect() through the DF's own queryExecution so the adaptive
      // plan we inspect afterwards is the FINAL one (count() would spawn
      // a separate execution and leave this one unplanned)
      val n = joined.collect().length
      assert(n === 40000, "inner join on a total dimension keeps all rows")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not skew-split the join:\n${finalPlan.take(2000)}")
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
