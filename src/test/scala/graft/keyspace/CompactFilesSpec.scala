package graft.keyspace

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The small-files compactor must shrink a fragmented layout to the
  * bin-packed file count WITHOUT changing a byte of data. */
class CompactFilesSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("compaction hits the exact bin-packed file count, data unchanged") {
    val base = Files.createTempDirectory("graft_compact").toString
    val (fragDir, compDir) = (s"$base/frag", s"$base/comp")
    try {
      // fragment deliberately: 16 writer tasks per shard directory
      val state = KvLog.state(spark, sf)
      state.repartition(16).write.mode("overwrite")
        .partitionBy("shard_id").parquet(fragDir)
      val fragCount = parquetFiles(fragDir).size
      assert(fragCount > 16, s"fragmentation failed: $fragCount files")

      val target = 1000L
      PartitionedLayout.compactFiles(spark, fragDir, compDir, target)

      // exact bin-packing: ceil(rows/target) files per shard directory
      val perShard = spark.read.parquet(fragDir)
        .groupBy("shard_id").count().collect()
        .map(r => r.getLong(1)).toSeq
      val wantFiles = perShard.map(n => (n + target - 1) / target).sum
      val gotFiles = parquetFiles(compDir).size
      assert(gotFiles.toLong === wantFiles,
        s"expected $wantFiles bin-packed files, found $gotFiles")
      assert(gotFiles < fragCount, "compaction must reduce the file count")

      // byte equality: same rows, same values
      val before = spark.read.parquet(fragDir)
        .select(col("key"), col("value"), col("shard_id").cast("long")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val after = spark.read.parquet(compDir)
        .select(col("key"), col("value"), col("shard_id").cast("long")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(after === before, "compaction must not change the data")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
