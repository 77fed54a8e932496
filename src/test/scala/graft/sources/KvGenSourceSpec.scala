package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, IsNotNull}
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.hash.Fnv1a32

/** The DSv2 connector's pushdown contract, asserted at the connector
  * API level AND end-to-end against a driver-side generator replay. */
class KvGenSourceSpec extends SparkSpec {

  private def replay(n: Long): Seq[(String, String, Long)] =
    (0L until n).map(i =>
      (s"gen:$i", s"v:${i % 97}", Fnv1a32.hashString(s"gen:$i") % 4))

  test("shard filter prunes partition planning to one of four") {
    val b = new KvGenScanBuilder(100)
    val rejected = b.pushFilters(Array(
      EqualTo("shard_id", 2L), IsNotNull("key")))
    // the source consumes the shard equality, hands back the rest
    assert(rejected.toSeq == Seq(IsNotNull("key")))
    assert(b.pushedFilters().toSeq == Seq(EqualTo("shard_id", 2L)))
    val scan = b.build().asInstanceOf[KvGenScan]
    assert(scan.planInputPartitions().length == 1)
    // without the filter: all four shards planned
    val all = new KvGenScanBuilder(100).build().asInstanceOf[KvGenScan]
    assert(all.planInputPartitions().length == 4)
  }

  test("conflicting shard equalities are handed back, not half-applied") {
    // shard_id = 2 AND shard_id = 3 is unsatisfiable; a source that accepts
    // both but honors only the first would return shard-2 rows. The builder
    // must consume neither so Spark's post-scan Filter yields empty.
    val b = new KvGenScanBuilder(100)
    val rejected = b.pushFilters(Array(
      EqualTo("shard_id", 2L), EqualTo("shard_id", 3L)))
    assert(rejected.toSet == Set(EqualTo("shard_id", 2L), EqualTo("shard_id", 3L)))
    assert(b.pushedFilters().isEmpty)
    assert(b.build().asInstanceOf[KvGenScan].planInputPartitions().length == 4)
    // end-to-end: the conjunction returns zero rows
    val df = spark.read.format("graft.sources.KvGenSource")
      .option("rows", "200").load()
      .filter(col("shard_id") === 2L && col("shard_id") === 3L)
    assert(df.count() == 0)
  }

  test("duplicate agreeing shard equalities consume one, hand back the rest") {
    val b = new KvGenScanBuilder(100)
    val rejected = b.pushFilters(Array(
      EqualTo("shard_id", 2L), EqualTo("shard_id", 2)))
    assert(b.pushedFilters().toSeq == Seq(EqualTo("shard_id", 2L)))
    assert(rejected.toSeq == Seq(EqualTo("shard_id", 2)))
    assert(b.build().asInstanceOf[KvGenScan].planInputPartitions().length == 1)
  }

  test("column pruning reaches the reader's schema") {
    val b = new KvGenScanBuilder(100)
    b.pruneColumns(new StructType().add("key", "string"))
    assert(b.build().readSchema().fieldNames.toSeq == Seq("key"))
  }

  test("end-to-end read equals the generator replay; dsv2 scan in plan") {
    val df = spark.read.format("graft.sources.KvGenSource")
      .option("rows", "500").load()
    assert(df.queryExecution.executedPlan.toString.contains("BatchScan"))
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == replay(500).toSet)
    // a filtered read sees exactly that shard's slice
    val sh1 = spark.read.format("graft.sources.KvGenSource")
      .option("rows", "500").load()
      .filter(col("shard_id") === 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sh1 == replay(500).filter(_._3 == 1L).toSet)
    assert(sh1.nonEmpty)
  }
}
