package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the [[Materialize]] mode switch: the three fault-tolerance
  * postures (local checkpoint / lineage-kept persist / reliable
  * checkpoint) must be pure execution-strategy choices — bit-identical
  * results on the iterative families that use the helper. Runs the
  * connected-components family (label propagation + star contraction +
  * SSSP all route through Materialize) and the convergence-driven
  * PageRank under each mode and compares collected rows exactly.
  */
class MaterializeSpec extends SparkSpec {

  private def withMode[T](mode: String)(body: => T): T = {
    val old = spark.conf.getOption(Materialize.ModeKey)
    spark.conf.set(Materialize.ModeKey, mode)
    try body
    finally old match {
      case Some(v) => spark.conf.set(Materialize.ModeKey, v)
      case None    => spark.conf.unset(Materialize.ModeKey)
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("mode parsing: unknown mode is rejected loudly") {
    intercept[IllegalArgumentException] {
      withMode("lcoal") { Materialize.mode(spark) }
    }
  }

  test("components family is bit-identical under all three modes") {
    import spark.implicits._
    // two components (a 4-chain and a triangle) plus a self-loop vertex —
    // enough rounds for the loop to actually iterate and release frames
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 20L)).toDF("doc_a", "doc_b")
    val got = Seq("local", "persist", "reliable").map { m =>
      m -> withMode(m) { rows(dedup.DedupComponents.components(edges)) }
    }.toMap
    assert(got("persist") === got("local"),
      "persist mode diverged from localCheckpoint")
    assert(got("reliable") === got("local"),
      "reliable checkpoint mode diverged from localCheckpoint")
    assert(got("local").nonEmpty)
  }

  test("HITS is bit-identical under all three modes") {
    val got = Seq("local", "persist", "reliable").map { m =>
      m -> withMode(m) {
        rows(graph.HitsQueries.queries("graph_hits")(spark, sf))
      }
    }.toMap
    assert(got("persist") === got("local"),
      "persist mode diverged from localCheckpoint")
    assert(got("reliable") === got("local"),
      "reliable checkpoint mode diverged from localCheckpoint")
    assert(got("local").nonEmpty)
  }

  test("the k-means Lloyd loop is bit-identical under all three modes") {
    val got = Seq("local", "persist", "reliable").map { m =>
      m -> withMode(m) {
        rows(sim.SimilarityQueries.queries("sim_kmeans_cells")(spark, sf))
      }
    }.toMap
    assert(got("persist") === got("local"))
    assert(got("reliable") === got("local"))
    assert(got("local").nonEmpty)
  }

  test("persist mode: loops release superseded rounds; reapAll drains the rest") {
    withMode("persist") {
      import spark.implicits._
      val edges = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
        .toDF("doc_a", "doc_b")
      assert(rows(dedup.DedupComponents.components(edges)).nonEmpty)
      // the loop's live frontier (result + never-released inputs) is
      // still pinned — the reap is what drains it, and it must drain
      // EVERYTHING: a second reap has nothing left to do
      assert(Materialize.reapAll(spark) > 0,
        "the loop should have left registered persist-mode frames")
      assert(Materialize.reapAll(spark) === 0,
        "reapAll must drain the registry completely")
    }
  }

  test("release acts on what apply did, not the conf at release time") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val m = withMode("persist") { Materialize(df) }
    // flip the mode away BEFORE releasing: release must still unpersist
    // the frame apply() persisted (membership-based, not mode-based)
    withMode("local") { Materialize.release(m) }
    assert(Materialize.reapAll(spark) === 0,
      "the persisted frame leaked past a runtime mode flip")
  }

  test("reliable mode falls back to tmpdir only on a local master") {
    // on local[*] the tmpdir fallback is sound (one machine); the
    // fail-fast for non-local masters is unit-tested by construction:
    // sc.isLocal is true here, so apply() must succeed without DirKey
    withMode("reliable") {
      import spark.implicits._
      assert(Materialize(Seq(1L).toDF("x")).count() === 1L)
    }
  }

  test("convergence-driven PageRank is bit-identical under all modes") {
    val got = Seq("local", "persist", "reliable").map { m =>
      m -> withMode(m) {
        val (r, iters) = relational.PageRank.convergedRanks(spark, sf)
        (rows(r.orderBy(col("pr").desc, col("node"))), iters)
      }
    }.toMap
    assert(got("persist") === got("local"))
    assert(got("reliable") === got("local"))
    assert(got("local")._1.nonEmpty && got("local")._2 > 0)
  }
}
