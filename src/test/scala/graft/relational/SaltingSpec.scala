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
}
