package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/** The coordinator's failure-handling control loop, closed as a stream: the
  * health monitor's transition events drive shard redistribution.
  *
  * The reference registers `onUnhealthy` (`cmd/coordinator/main.go:322-334`)
  * which only re-runs auto-assign over UNASSIGNED shards — its documented
  * P0 gap (`ISSUES_AND_SOLUTIONS.md:75-127`). This is the fixed control
  * loop, matching the batch `redistribute_on_failure` query: on an
  * unhealthy transition, the dead node's shards move round-robin onto the
  * surviving healthy nodes (in membership order); on recovery the node
  * rejoins the healthy pool but keeps no shards until the next event that
  * hands it some — exactly the reference's recovery semantics (recovered
  * nodes are routable again but nothing is proactively moved back).
  *
  * The registry itself is coordinator metadata — a handful of entries, held
  * driver-side like the reference's in-memory `ShardRegistry`, while the
  * heavy side (probe analysis) runs distributed in
  * [[HealthMonitor.transitions]]. At 4 shards or 40 000, the registry stays
  * O(shards) and the stream stays O(probe volume).
  */
object RedistributeStream {

  /** Coordinator registry snapshot: assignments + membership. */
  case class Registry(assignments: Map[Long, String], nodeOrder: Seq[String],
      healthy: Set[String])

  /** Fold one health transition into the registry (pure — the unit the
    * spec replays and the foreachBatch sink applies). */
  def applyTransition(reg: Registry, t: Transition): Registry =
    t.status match {
      case "unhealthy" =>
        val healthy = reg.healthy - t.nodeId
        val survivors = reg.nodeOrder.filter(healthy.contains)
        if (survivors.isEmpty) reg.copy(healthy = healthy)
        else {
          val failed = reg.assignments.collect {
            case (sid, n) if n == t.nodeId => sid
          }.toSeq.sorted
          val moved = failed.zipWithIndex.map { case (sid, r) =>
            sid -> survivors(r % survivors.size)
          }
          Registry(reg.assignments ++ moved, reg.nodeOrder, healthy)
        }
      case "healthy" if t.prevStatus == "unhealthy" =>
        reg.copy(healthy = reg.healthy + t.nodeId)
      case _ => reg
    }

  /** Replay a transition log in seq order — the deterministic batch twin.
    * Ties on seq (two nodes failing at the same probe round) break by
    * node id: a bare seq sort would fall back to collect()'s partition
    * order, and a replay-from-log recovery could then reconstruct a
    * DIFFERENT routing table than the live run used. */
  def replay(reg: Registry, ts: Seq[Transition]): Registry =
    ts.sortBy(t => (t.seq, t.nodeId)).foldLeft(reg)(applyTransition)

  /** Wire the loop: each micro-batch of transitions updates the registry
    * via `onUpdate` (the coordinator's single-threaded callback, exactly
    * like the reference's mutex-guarded registry mutation).
    *
    * RECOVERY CONTRACT: the registry lives in a driver-local var, NOT in
    * the streaming checkpoint. On restart-from-checkpoint the stream
    * resumes past already-consumed transitions, but `reg` restarts from
    * `initial` — so a checkpointed deployment must either persist the
    * registry in `onUpdate` (snapshot per batch, e.g. to the metadata
    * store the coordinator serves from) and pass the last snapshot back
    * as `initial`, or replay the full transition log from seq 0. This
    * mirrors the reference, whose in-memory `ShardRegistry` also loses
    * state on coordinator restart (no persistent metadata,
    * `internal/coordinator/shard_registry.go:35-103`); `RecoverySpec`
    * exercises the snapshot-and-resume path for the kv stream. */
  def start(transitions: Dataset[Transition], initial: Registry)(
      onUpdate: Registry => Unit): StreamingQuery = {
    var reg = initial
    transitions.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Transition], _: Long) =>
        reg = replay(reg, batch.collect().toSeq)
        onUpdate(reg)
      }
      .start()
  }
}
