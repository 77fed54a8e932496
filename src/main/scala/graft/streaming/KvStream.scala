package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyspace write operation (the reference's PUT/DELETE wire ops). */
case class KvOp(seq: Long, op: String, key: String, value: Option[String])

/** Per-key monitor state: the winning op so far. */
case class KvKeyState(seq: Long, op: String, value: Option[String])

/** An emitted change: what a subscriber of the keyspace would see. */
case class KvChange(key: String, seq: Long, change: String,
    value: Option[String])

/** The reference's write path as a stream: PUT/DELETE ops flow in, per-key
  * last-write-wins state lives in Spark-managed keyed state, and a change
  * feed (upserted/deleted) flows out — the streaming twin of
  * [[graft.keyspace.KvLog.compact]].
  *
  * LWW is seq-based, so out-of-order arrivals are handled exactly like the
  * batch compaction: an op older than the current state is ignored, and
  * replays of the winning op are idempotent (no duplicate change event).
  * State is hash-partitioned by key across executors — the same horizontal
  * scale shape as the reference's key→shard routing, with checkpointed
  * exactly-once recovery replacing the reference's "memory-only, lost on
  * restart" limitation (`internal/shard/doc.go:321-326`).
  */
object KvStream {

  def step(state: Option[KvKeyState], op: KvOp)
      : (Option[KvKeyState], Option[KvChange]) = {
    // reads never mutate keyed state or emit changes — the op log carries
    // get traffic for the operation counters, but only writes compact
    if (op.op == "get") return (state, None)
    val stale = state.exists(_.seq >= op.seq)
    if (stale) (state, None)
    else {
      val next = KvKeyState(op.seq, op.op, op.value)
      val change =
        if (op.op == "delete") {
          // idempotent: deleting an absent/already-deleted key emits nothing
          if (state.exists(_.op == "put"))
            Some(KvChange(op.key, op.seq, "deleted", None))
          else None
        } else Some(KvChange(op.key, op.seq, "upserted", op.value))
      (Some(next), change)
    }
  }

  private def fn(key: String, ops: Iterator[KvOp],
      state: GroupState[KvKeyState]): Iterator[KvChange] = {
    var st = state.getOption
    val out = ops.toSeq.sortBy(_.seq).flatMap { op =>
      val (next, change) = step(st, op)
      st = next
      change
    }
    st.foreach(state.update)
    out.iterator
  }

  def changes(ops: Dataset[KvOp])(implicit spark: SparkSession): Dataset[KvChange] = {
    import spark.implicits._
    ops.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
