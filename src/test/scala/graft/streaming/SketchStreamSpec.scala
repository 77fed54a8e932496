package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.events.EventsQueries
import graft.sketch.CmsCounts

/** Counter addition is associative and commutative, so the streaming CMS
  * state must finish BIT-EQUAL to the batch aggregate over the same feed,
  * for any micro-batch chunking and any intra-batch order.
  */
class SketchStreamSpec extends SparkSpec {

  private lazy val rows: Array[Event] = EventsQueries.events(spark, sf)
    .orderBy("ts", "event_id").collect()
    .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private lazy val batchSketches: Map[String, Seq[Long]] =
    EventsQueries.events(spark, sf)
      .withColumn("u", col("user_id").cast("string"))
      .groupBy("event_type")
      .agg(CmsCounts.cmsCounts(col("u"), SketchStream.Depth,
        SketchStream.Width).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  private def runStream(name: String, chunks: Seq[Seq[Event]])
      : Map[String, Seq[Long]] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = SketchStream.cmsPerType(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    for (chunk <- chunks) { input.addData(chunk); q.processAllAvailable() }
    val sentinels = rows.map(_.eventType).distinct.zipWithIndex.map {
      case (t, i) => Event(-1L - i, 0L, -1L, t, 0.0)
    }
    input.addData(sentinels.toSeq); q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("streaming CMS state finishes bit-equal to the batch aggregate") {
    val got = runStream("cms_out",
      rows.grouped(math.max(1, rows.length / 4)).map(_.toSeq).toSeq)
    assert(got.keySet === batchSketches.keySet)
    got.foreach { case (t, sk) =>
      assert(sk === batchSketches(t), s"sketch diverged for $t")
    }
  }

  test("final sketch is chunking- and order-invariant") {
    val rnd = new Random(29)
    val shuffled = rows
      .grouped(1 + rnd.nextInt(rows.length / 2))
      .map(c => rnd.shuffle(c.toSeq)).toSeq
    val got = runStream("cms_out_shuffled", shuffled)
    got.foreach { case (t, sk) => assert(sk === batchSketches(t)) }
  }
}
