package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.EventsQueries
import graft.sketch.CmsCounts

/** A per-type count-min sketch emitted at stream close. */
case class SketchOut(event_type: String, sketch: Array[Long])

/** Count-min sketch accumulation in streaming state: the live form of
  * `events_cms_topk`'s sketch build. Keyed by event type, the state is
  * the `depth × width` counter array itself — updates are per-item
  * increments, and because counter addition is associative and
  * commutative, the final state is BIT-EQUAL to the batch aggregate over
  * the same feed no matter how it was micro-batched (proven in
  * SketchStreamSpec). This is the production shape for continuous
  * heavy-hitter monitoring: state size is fixed regardless of ingest
  * volume, and any item's frequency estimate is readable at any time.
  *
  * Rows with `user_id < 0` are close sentinels: on seeing one, the group
  * emits its sketch (a real deployment would read the state store or
  * emit on a processing-time timeout instead).
  */
object SketchStream {

  val Depth: Int = EventsQueries.CmsDepth
  val Width: Int = EventsQueries.CmsWidth

  private def fn(eventType: String, events: Iterator[Event],
      state: GroupState[Array[Long]]): Iterator[SketchOut] = {
    val sk = state.getOption.getOrElse(new Array[Long](Depth * Width))
    var close = false
    events.foreach { e =>
      if (e.userId < 0) close = true
      // the ONE update kernel, shared with the batch aggregate — the
      // bit-equality contract depends on a single hash/bucket definition
      else CmsCounts.add(sk, e.userId.toString, Depth, Width)
    }
    state.update(sk)
    if (close) Iterator.single(SketchOut(eventType, sk.clone()))
    else Iterator.empty
  }

  def cmsPerType(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[SketchOut] = {
    import spark.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[Array[Long], SketchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
