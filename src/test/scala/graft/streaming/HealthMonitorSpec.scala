package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.cluster.ClusterQueries

/** The streaming health monitor must agree with the batch gaps-and-islands
  * query on identical probe input, including across micro-batch boundaries
  * (state carried in GroupState, not recomputed per batch).
  */
class HealthMonitorSpec extends SparkSpec {

  private def allProbes: Seq[Probe] =
    ClusterQueries.probes(spark, sf).orderBy("seq").collect()
      .map(r => Probe(r.getString(1), r.getLong(0), r.getBoolean(2))).toSeq

  private def batchExpected: Seq[(String, Long, String, String)] =
    ClusterQueries.queries("health_transitions")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq

  test("pure step function: threshold, recovery, transition-only") {
    var st = HealthState(0, "unknown")
    def feed(ok: Boolean, seq: Long) = {
      val (n, ev) = HealthMonitor.step(st, Probe("n1", seq, ok)); st = n; ev
    }
    assert(feed(ok = false, 1).isEmpty) // 1st fail: no event
    assert(feed(ok = false, 2).isEmpty) // 2nd fail: no event
    assert(feed(ok = false, 3).map(_.status) === Some("unhealthy")) // 3rd
    assert(feed(ok = false, 4).isEmpty) // stays unhealthy, no re-fire
    assert(feed(ok = true, 5).map(_.status) === Some("healthy")) // recovery
    assert(feed(ok = true, 6).isEmpty) // idempotent
  }

  test("streaming transitions across micro-batches match the batch query") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Probe]
    val query = HealthMonitor.transitions(input.toDS())
      .writeStream.format("memory").queryName("health_out")
      .outputMode("append").start()

    // split the probe log mid-failure-run so state must survive the
    // batch boundary
    val probes = allProbes
    val (b1, rest) = probes.splitAt(probes.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    for (b <- Seq(b1, b2, b3)) {
      input.addData(b)
      query.processAllAvailable()
    }
    query.stop()

    val got = spark.table("health_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got === batchExpected)
    assert(got.exists(_._4 == "unhealthy"))
  }
}
