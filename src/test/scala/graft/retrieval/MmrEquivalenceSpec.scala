package graft.retrieval

import graft.SparkSpec

/** Pins the executor-side MMR (`flatMapGroups` greedy, in-group Scala
  * cosine) bit-identical to the collected driver-side variant (Catalyst
  * Dot64 cosine + driver greedy) — the round-9 verdict's prescribed
  * cross-check for moving the last driver-compute step in the serving
  * path onto executors. Any drift in the Scala dot's fold order, the
  * penalty max, or the argmax tie-break shows up here as a row diff.
  */
class MmrEquivalenceSpec extends SparkSpec {

  test("executor-side MMR equals the collected cross-check bit-for-bit") {
    val served = RetrievalQueries.mmrRerank(spark, sf)
      .collect().map(_.toString).toSeq
    val collected = RetrievalQueries.mmrRerankCollected(spark, sf)
      .collect().map(_.toString).toSeq
    assert(served.nonEmpty)
    assert(served === collected)
  }
}
