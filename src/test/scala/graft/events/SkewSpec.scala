package graft.events

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The salted operators' two contracts: (1) the mitigation is
  * answer-invariant (equal to the plain unsalted query), and (2) the hot
  * key genuinely fans out across all salts — the property that kills the
  * straggler at scale. */
class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals the unsalted aggregation") {
    val salted = SkewQueries.queries("events_skew_salted_agg")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val plain = EventsQueries.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq) // bit-equal incl. the doubles
  }

  test("salted join equals the plain join, broadcast or not") {
    val salted = SkewQueries.queries("events_skew_salted_join")(spark, sf)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2)))
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val plain = EventsQueries.events(spark, sf)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("c_nationkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("the hottest key fans out across all Salts sub-partitions") {
    val ev = EventsQueries.events(spark, sf)
    val hot = ev.groupBy("user_id").count()
      .orderBy(col("count").desc).limit(1)
      .collect().head.getLong(0)
    val fanout = ev.filter(col("user_id") === hot)
      .withColumn("salt", pmod(graft.hash.Fnv1a32
        .fnv1a32(col("event_id").cast("string")), lit(SkewQueries.Salts.toLong)))
      .select("salt").distinct().count()
    assert(fanout == SkewQueries.Salts,
      s"hot key $hot reached only $fanout of ${SkewQueries.Salts} salts")
  }

  test("plan shape: two-phase agg shuffles on (user_id, salt) then user_id") {
    val p = SkewQueries.queries("events_skew_salted_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.exists(l => l.contains("user_id") && l.contains("salt")),
      s"no (user_id, salt) exchange in:\n${p.take(2000)}")
    assert(exchanges.exists(l => l.contains("user_id") && !l.contains("salt")),
      s"no user_id-only combine exchange in:\n${p.take(2000)}")
  }

  test("plan shape: salted join is a shuffle join keyed on (key, salt)") {
    val p = SkewQueries.queries("events_skew_salted_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"expected a shuffle join (the salted regime), got:\n${p.take(2000)}")
    assert(!p.contains("BroadcastHashJoin") || p.linesIterator
        .exists(l => (l.contains("ShuffledHashJoin") || l.contains("SortMergeJoin"))
          && l.contains("salt")),
      s"salted join keys missing from the shuffle join:\n${p.take(2000)}")
  }
}
