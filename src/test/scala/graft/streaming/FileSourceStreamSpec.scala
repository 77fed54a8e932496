package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.EventsQueries

/** The production entry point: `readStream` over a parquet directory —
  * files dropped into the directory become micro-batches. Same windowed
  * aggregation as the MemoryStream tests, driven through the real file
  * source (schema declaration, discovery, watermark advance via a late
  * sentinel file).
  */
class FileSourceStreamSpec extends SparkSpec {

  test("file-source stream of parquet drops matches the batch window counts") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_stream_src")
    val inDir = Files.createDirectory(base.resolve("in")).toString
    try {
      val stream = spark.readStream
        .schema(graft.events.EventsQueries.RawSchema)
        .parquet(inDir)
        .select(col("event_id").as("eventId"),
          graft.events.EventsQueries.tsUs(col("ts")).as("tsUs"),
          col("user_id").as("userId"),
          col("event_type").as("eventType"), col("value"))
        .as[Event]
      val q = EventStream.tumblingCounts(stream)
        .writeStream.format("memory").queryName("file_src_out")
        .outputMode("append").start()

      // drop the real fixture file into the watched directory
      Files.copy(Paths.get(s"$sf/events.parquet"),
        Paths.get(s"$inDir/batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()

      // sentinel file far in the future advances the watermark so every
      // real window closes
      val maxTs = EventsQueries.events(spark, sf).agg(max("ts")).first().getLong(0)
      Seq((-1L, (maxTs + 4L * 3600 * 1000000) * 1000, 0L, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      q.stop()

      val got = spark.table("file_src_out")
        .filter(col("event_type") =!= "sentinel")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val expected = EventsQueries.queries("events_tumbling_agg")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got === expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    }
  }
}
