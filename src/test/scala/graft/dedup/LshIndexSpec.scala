package graft.dedup

import java.io.File

import graft.SparkSpec

/** The persisted dedup index's contract: the served probe equals the
  * retrain-per-query incremental path bit-for-bit, the standing corpus
  * is never re-shingled at probe time, and the index builds once. */
class LshIndexSpec extends SparkSpec {

  private def rebuiltFresh(): String = {
    val path = LshIndex.indexPath(sf)
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete()
    }
    del(new File(path))
    path
  }

  test("served probe equals the incremental path bit-for-bit") {
    rebuiltFresh()
    val served = LshIndex.probe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val incremental = DedupQueries.queries("dedup_lsh_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == incremental)
    assert(served.nonEmpty)
  }

  test("probe plan scans the corpus once: index side comes from files") {
    LshIndex.buildIfMissing(spark, sf)
    val plan = LshIndex.probe(spark, sf).queryExecution.executedPlan.toString
    // the new batch needs one documents read (it is materialized at
    // construction by the localCheckpoint, so the plan shows none);
    // the standing index must come from the persisted tables only
    val docScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(docScans == 0,
      s"probe plan re-reads documents $docScans times:\n" + plan.take(2000))
    assert(plan.contains("/postings") && plan.contains("/shingles"),
      plan.take(2000))
  }

  test("the index builds once and is reused") {
    val path = LshIndex.buildIfMissing(spark, sf)
    val marker = new File(s"$path/postings/_SUCCESS")
    val t0 = marker.lastModified()
    LshIndex.probe(spark, sf).collect()
    LshIndex.probe(spark, sf).collect()
    assert(marker.lastModified() == t0)
  }
}
