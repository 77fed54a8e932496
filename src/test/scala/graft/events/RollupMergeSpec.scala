package graft.events

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental-rollup contract: stored partial state + a new slice's
  * partial state merge to EXACTLY the full recompute — including when the
  * stored side has round-tripped through parquet (the production shape)
  * and for ANY slicing of history, because every merged stat is a
  * commutative monoid and the value sum is decimal-exact. */
class RollupMergeSpec extends SparkSpec {

  private def ev = EventsQueries.events(spark, sf)
    .withColumn("day", expr(s"ts div ${EventsQueries.DayUs}"))

  private def direct = EventsQueries.rollupMerge(
    EventsQueries.rollupPartial(ev))

  test("parquet-roundtripped stored state + fresh day == full recompute") {
    val maxDay = ev.agg(max("day")).head.getLong(0)
    val dir = Files.createTempDirectory("rollup_state").toString
    EventsQueries.rollupPartial(ev.filter(col("day") < maxDay))
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val fresh = EventsQueries.rollupPartial(ev.filter(col("day") === maxDay))
    val merged = EventsQueries.rollupMerge(stored.unionByName(fresh))
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("merge is slicing-invariant: 7 hash slices == full recompute") {
    val slices = (0 until 7).map(k =>
      EventsQueries.rollupPartial(ev.filter(pmod(col("event_id"), lit(7)) === k)))
    val merged = EventsQueries.rollupMerge(slices.reduce(_ unionByName _))
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("the registered query equals the full recompute") {
    val q = graft.SparkEntry.queries("events_rollup_merge")(spark, sf)
    assert(q.collect().toSeq == direct.collect().toSeq)
  }
}
