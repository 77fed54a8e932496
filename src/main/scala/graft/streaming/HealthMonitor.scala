package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A health probe observation (one monitor tick for one node). */
case class Probe(nodeId: String, seq: Long, ok: Boolean)

/** Per-node monitor state carried across micro-batches. */
case class HealthState(consecutiveFails: Int, status: String)

/** A status-change event — the streaming analog of the reference's
  * transition-only `onUnhealthy` callback and recovery log line. */
case class Transition(nodeId: String, seq: Long, prevStatus: String,
    status: String)

/** Streaming variant of the health monitor's consecutive-failure state
  * machine (reference: `internal/coordinator/health_monitor.go:221-254`):
  *
  *   - failure ⇒ consecutiveFails++; on reaching maxFailures (3) the node
  *     transitions to `unhealthy`, and the event fires ONLY on the
  *     transition (`health_monitor.go:238-243`);
  *   - success ⇒ reset to `healthy` (recovery, `health_monitor.go:245-253`);
  *   - before any probe ⇒ `unknown` (`health_monitor.go:210`).
  *
  * The reference runs this as a 5-second ticker loop over an in-process map
  * (`health_monitor.go:111-145`); here the probe results are a stream and
  * the per-node `(consecutiveFails, status)` pair lives in Spark-managed
  * keyed state, so the same machine scales horizontally: state is
  * hash-partitioned by nodeId across executors and checkpointed for
  * exactly-once recovery — no RWMutex, no single monitor goroutine.
  *
  * Probes are folded in `seq` order within each micro-batch; cross-batch
  * order is the source's responsibility (a monitor emits ticks
  * monotonically).
  */
object HealthMonitor {
  val MaxFailures = 3

  def step(state: HealthState, p: Probe): (HealthState, Option[Transition]) = {
    val next =
      if (p.ok) HealthState(0, "healthy")
      else {
        val f = state.consecutiveFails + 1
        HealthState(f, if (f >= MaxFailures) "unhealthy" else state.status)
      }
    val ev = if (next.status != state.status)
      Some(Transition(p.nodeId, p.seq, state.status, next.status)) else None
    (next, ev)
  }

  private def fn(nodeId: String, probes: Iterator[Probe],
      state: GroupState[HealthState]): Iterator[Transition] = {
    var st = state.getOption.getOrElse(HealthState(0, "unknown"))
    val out = probes.toSeq.sortBy(_.seq).flatMap { p =>
      val (next, ev) = step(st, p)
      st = next
      ev
    }
    state.update(st)
    out.iterator
  }

  /** Works on both streaming and batch Datasets (Spark supports
    * flatMapGroupsWithState on batch, state starting empty). */
  def transitions(probes: Dataset[Probe])(implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    probes.groupByKey(_.nodeId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
