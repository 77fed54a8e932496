package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution on the keyspace store: a long-lived 100 TB table is
  * written by many pipeline versions — later files carry columns earlier
  * ones lack. The read side must (a) unify the schemas when asked
  * (mergeSchema), surfacing missing values as NULL, and (b) keep the
  * DEFAULT fast path (no merge) pinned to a single footer's schema so a
  * widened late file can't silently change every reader's plan. */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unifies generations; missing columns surface as NULL") {
    val base = Files.createTempDirectory("graft_schema_evo").toString
    try {
      val v1 = graft.keyspace.KvLog.state(spark, sf)
        .select("key", "value").limit(100)
      v1.write.parquet(s"$base/gen=1")
      // generation 2 adds shard_id and a new op-count column
      graft.keyspace.KvLog.state(spark, sf)
        .withColumn("n_writes", lit(1L)).limit(50)
        .write.parquet(s"$base/gen=2")

      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$base/gen=1", s"$base/gen=2")
      val cols = merged.columns.toSet
      assert(cols === Set("key", "value", "shard_id", "n_writes"),
        s"merged schema must be the union, got $cols")
      // rows from generation 1 carry NULLs for the late columns
      val gen1Nulls = merged.filter(col("shard_id").isNull &&
        col("n_writes").isNull).count()
      assert(gen1Nulls === 100L,
        "every generation-1 row must surface NULL for the added columns")
      // and no data was lost across generations
      assert(merged.count() === 150L)

      // the non-merged read must not throw on the narrow generation and
      // projecting a column that generation lacks yields NULL, not error,
      // when the chosen schema is the WIDE one
      val wideFirst = spark.read
        .schema(merged.schema)
        .parquet(s"$base/gen=1", s"$base/gen=2")
      assert(wideFirst.filter(col("n_writes").isNotNull).count() === 50L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
