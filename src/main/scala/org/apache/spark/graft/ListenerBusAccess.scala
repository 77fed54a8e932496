package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the profiling tool
  * needs to drain it so per-stage rows collected by a SparkListener are
  * complete before they are printed (the async bus can otherwise still
  * hold tail-stage events when the timed action returns). This shim
  * lives in a child package of org.apache.spark purely to re-export
  * that one call — no Spark internals are modified or re-implemented.
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
