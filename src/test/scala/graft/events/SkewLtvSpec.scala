package graft.events

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Conservation laws for the skew audit and the running-LTV window. */
class SkewLtvSpec extends SparkSpec {

  test("skew buckets conserve keys and rows; bounds honor the bucket") {
    val ev = EventsQueries.events(spark, sf)
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    val rows = graft.SparkEntry.queries("events_key_skew")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == total, "n_rows don't sum to corpus")
    assert(rows.map(_.getLong(1)).sum == users, "n_keys don't sum to users")
    for (r <- rows) {
      val (bucket, maxFreq) = (r.getLong(0), r.getLong(3))
      assert(maxFreq >= (1L << (bucket - 1)) && maxFreq < (1L << bucket),
        s"max_freq $maxFreq outside bucket $bucket")
    }
  }

  test("running LTV's final prefix per user equals the user's total") {
    val got = graft.SparkEntry.queries("events_running_ltv")(spark, sf)
      .groupBy("user_id").agg(max("ltv_running").as("last"))
    val want = EventsQueries.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
    val joined = got.join(want, "user_id")
      .filter(col("last") =!= col("total"))
    assert(joined.count() == 0, "running prefix drifts from exact total")
    assert(got.count() == want.count())
  }
}
