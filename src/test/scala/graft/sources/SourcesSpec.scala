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
}
