package graft.text

import graft.SparkSpec

/** Laws of the multi-merge BPE trainer. */
class BpeTrainSpec extends SparkSpec {

  private lazy val rows =
    graft.SparkEntry.queries("text_bpe_train")(spark, sf)
      .collect().sortBy(_.getLong(0))

  test("each merge removes exactly its occurrence count of symbols") {
    assert(rows.length == TextQueries.BpeTrainIters)
    for (Array(a, b) <- rows.sliding(2)) {
      val (tsA, tsB, nB) = (a.getLong(3), b.getLong(3), b.getLong(2))
      assert(tsA - tsB == nB,
        s"iter ${b.getLong(0)}: symbol drop ${tsA - tsB} != count $nB")
    }
  }

  test("greedy winner counts are non-increasing across iterations") {
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("iteration 1 merges the corpus-wide top character pair") {
    val top = graft.SparkEntry.queries("text_bpe_pair_stats")(spark, sf)
      .collect().head.getString(0) // e.g. "er"
    val merge1 = rows.head.getString(1) // e.g. "<e><r>"
    assert(merge1 == s"<${top(0)}><${top(1)}>",
      s"trainer's first merge $merge1 != pair_stats top '$top'")
  }

  test("merges are distinct and well-formed bracket pairs") {
    val pairs = rows.map(_.getString(1))
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall(p => p.startsWith("<") && p.endsWith(">") &&
      p.contains("><")))
  }
}
