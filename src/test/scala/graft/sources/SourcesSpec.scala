package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.keyspace.KvLog

class SourcesSpec extends SparkSpec {

  test("keyspace state round-trips losslessly through parquet/orc/json/csv") {
    val base = Files.createTempDirectory("graft_sources").toString
    try {
      // include hostile keys/values: spaces, colons, unicode, quotes, commas
      import spark.implicits._
      val extra = Seq(
        ("key with spaces", "value, with commas", 1L),
        ("key:with:colons", "\"quoted\" value", 2L),
        ("数字", "unicode ✓ value", 3L)
      ).toDF("key", "value", "shard_id")
      val state = KvLog.state(spark, sf).unionByName(extra)
      Sources.writeKv(state, base)

      val expected = state.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      for (fmt <- Seq("parquet", "orc", "json", "csv")) {
        val got = Sources.readKv(spark, base, fmt).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
        assert(got === expected, s"format $fmt lost or mangled rows")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("schema evolution: mergeSchema unions columns across file vintages") {
    // the 100 TB reality: a column added mid-corpus. Old files must keep
    // reading (null-filled) and new files must surface the column — the
    // contract that lets a layout evolve without a rewrite.
    val base = Files.createTempDirectory("graft_evolve").toString
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
        .write.mode("append").parquet(base)
      Seq(("k3", "v3", 60L)).toDF("key", "value", "ttl_s")
        .write.mode("append").parquet(base)
      val merged = spark.read.option("mergeSchema", "true").parquet(base)
      assert(merged.columns.sorted.toSeq === Seq("key", "ttl_s", "value"))
      val rows = merged.orderBy("key").collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(merged.columns.indexOf("ttl_s"))) None
          else Some(r.getLong(merged.columns.indexOf("ttl_s")))))
      assert(rows.toSeq === Seq("k1" -> None, "k2" -> None, "k3" -> Some(60L)))
      // and the pre-evolution projection still prunes to the old columns
      val narrow = spark.read.option("mergeSchema", "true").parquet(base)
        .select("key", "value")
      assert(narrow.count() === 3)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
