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
