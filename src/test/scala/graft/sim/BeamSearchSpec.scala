package graft.sim

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The graph-traversal ANN contract: the served beam is bit-identical to
  * the per-call exhibit, the answer is a correctly-ranked top-K, the
  * walk never worsens across hops, the driver-held id lists stay within
  * their documented bounds (the CollectBoundsSpec discipline), and the
  * recall twin reports a consistent single-row eval.
  */
class BeamSearchSpec extends SparkSpec {

  import BeamSearch._

  private lazy val exact =
    BeamSearch.queries("sim_graph_beam_ann")(spark, sf).collect().toSeq
  private lazy val served =
    BeamSearch.queries("sim_graph_beam_served")(spark, sf).collect().toSeq

  test("served beam (persisted kNN graph) is bit-identical to the exact exhibit") {
    assert(served == exact)
  }

  test("planes-scaled beam coincides with the fixed-plane walk at gate SF") {
    // planesFor floors at NumPlanes for gate-sized corpora, so the
    // scaled graph IS the fixed graph and the walks agree bit-for-bit
    val scaled =
      BeamSearch.queries("sim_graph_beam_scaled")(spark, sf).collect().toSeq
    assert(scaled == exact)
  }

  test("answer is BeamK rows ranked 1..K with non-increasing cosine, query excluded") {
    assert(exact.size == BeamK)
    assert(exact.map(_.getLong(0)) == (1L to BeamK.toLong))
    val cs = exact.map(_.getDouble(2))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    assert(!exact.map(_.getLong(1)).contains(SimilarityQueries.QueryVec))
  }

  test("the walk is monotone: the final best is at least the best entry point") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") === SimilarityQueries.QueryVec)
      .select(col("embedding").as("q_emb"))
    val bestEntry = e
      .filter(col("vec_id") =!= SimilarityQueries.QueryVec)
      .filter(pmod(graft.hash.Fnv1a32.fnv1a32(
        concat(lit("beam:"), col("vec_id").cast("string"))),
        lit(EntryRate.toLong)) === 0)
      .crossJoin(broadcast(q))
      .select(SimilarityQueries.cosine(col("embedding"), col("q_emb"))
        .as("c"))
      .agg(max("c")).head().getDouble(0)
    assert(exact.head.getDouble(2) >= bestEntry)
  }

  test("driver-held id lists stay within the documented bounds") {
    // the beam itself is a LIMIT BeamWidth cut; what needs pinning is
    // the neighbor fan-out: the graph's out-degree is capped at KnnK by
    // construction, so any BeamWidth-sized frontier collects at most
    // BeamWidth * KnnK neighbor ids — re-derive the worst frontier
    val path = KnnGraphIndex.buildIfMissing(spark, sf)
    val edges = spark.read.parquet(s"$path/edges")
    val maxDeg = edges.groupBy("vec_id").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(maxDeg <= SimilarityQueries.KnnK,
      s"edge out-degree $maxDeg exceeds KnnK — the per-hop collect " +
        "bound BeamWidth*KnnK no longer holds")
    assert(BeamWidth * (SimilarityQueries.KnnK + 1) <= 64,
      "per-hop literal-IN list must stay control-plane-sized")
  }

  test("batch walk: BeamK ranked rows per sampled query, self excluded") {
    val rows = BeamSearch.queries("sim_graph_beam_batch")(spark, sf).collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.keySet == (0L until 500L by 50L).toSet)
    for ((q, rs) <- perQ) {
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to BeamK.toLong))
      assert(!rs.map(_.getLong(2)).contains(q))
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("batch recall twin emits sim_ann_recall's exact row shape") {
    val df = BeamSearch.queries("sim_beam_batch_recall")(spark, sf)
    assert(df.columns.toSeq ==
      Seq("q_id", "method", "n_hits", "recall_at_5"))
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getString(1) == "graph_beam"))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= BeamK))
  }

  test("recall twin: one row, counts consistent, and the beam finds the neighborhood") {
    val r = BeamSearch.queries("sim_beam_recall")(spark, sf).collect()
    assert(r.length == 1)
    val Row(k: Long, nHit: Long, recall: Double) = r.head
    assert(k == BeamK.toLong)
    assert(nHit >= 0L && nHit <= k)
    assert(recall == nHit.toDouble / BeamK)
  }

  test("the beam cut plans as TakeOrderedAndProject, not a global sort") {
    val plan = BeamSearch.queries("sim_graph_beam_served")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
