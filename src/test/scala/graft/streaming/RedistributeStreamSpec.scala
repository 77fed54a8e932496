package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.cluster.ClusterQueries

/** The streamed failure-handling loop must land on exactly the assignments
  * the batch `redistribute_on_failure` query computes for the same
  * scenario: all four nodes healthy with a full round-robin, then n4 fails
  * three consecutive probes and its shards move to the survivors.
  */
class RedistributeStreamSpec extends SparkSpec {

  private val initial = RedistributeStream.Registry(
    assignments = Map(0L -> "n1", 1L -> "n2", 2L -> "n3", 3L -> "n4"),
    nodeOrder = Seq("n1", "n2", "n3", "n4"),
    healthy = Set("n1", "n2", "n3", "n4"))

  test("streamed unhealthy transition moves the dead node's shards like the batch query") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // n4: ok, then 3 consecutive failures spread over TWO micro-batches —
    // the transition must fire exactly once, in the second batch
    val input = MemoryStream[Probe]
    @volatile var last = initial
    val q = RedistributeStream.start(
      HealthMonitor.transitions(input.toDS()), initial)(r => last = r)
    input.addData(Probe("n4", 1, ok = true), Probe("n4", 2, ok = false))
    q.processAllAvailable()
    assert(last.assignments(3L) === "n4", "no transition before 3rd failure")
    input.addData(Probe("n4", 3, ok = false), Probe("n4", 4, ok = false))
    q.processAllAvailable()
    q.stop()

    assert(last.healthy === Set("n1", "n2", "n3"))
    val expected = ClusterQueries.queries("redistribute_on_failure")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(last.assignments === expected)
  }

  test("recovery rejoins the pool without moving shards back") {
    val afterFail = RedistributeStream.replay(initial, Seq(
      Transition("n4", 10, "unknown", "unhealthy")))
    val afterRecover = RedistributeStream.applyTransition(afterFail,
      Transition("n4", 20, "unhealthy", "healthy"))
    assert(afterRecover.healthy.contains("n4"))
    assert(afterRecover.assignments === afterFail.assignments)
    // a later failure of another node CAN hand shards to the recovered one
    val n1Fails = RedistributeStream.applyTransition(afterRecover,
      Transition("n1", 30, "healthy", "unhealthy"))
    assert(!n1Fails.assignments.values.toSet.contains("n1"))
  }
}
