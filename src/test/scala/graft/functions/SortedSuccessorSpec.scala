package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec
import SortedSuccessor.sortedSuccessor

class SortedSuccessorSpec extends SparkSpec {

  private val bounds = Seq(10L, 20L, 30L, 40L)

  private def viaSpark(xs: Seq[Long]): Seq[Int] = {
    import spark.implicits._
    xs.toDF("x").select(sortedSuccessor(bounds, col("x")).as("i"))
      .collect().map(_.getInt(0)).toSeq
  }

  test("lower-bound edges: below, equal, between, above") {
    val xs = Seq(Long.MinValue, 9L, 10L, 11L, 20L, 39L, 40L, 41L,
      Long.MaxValue)
    val expect = xs.map(x => bounds.indexWhere(_ >= x) match {
      case -1 => bounds.size
      case i  => i
    })
    assert(viaSpark(xs) == expect)
  }

  test("codegen and interpreted eval agree on random inputs") {
    val rnd = new scala.util.Random(42)
    val bs = Seq.fill(97)(rnd.nextLong()).distinct.sorted
    val xs = Seq.fill(500)(rnd.nextLong()) ++ bs // hit exact boundaries too
    import spark.implicits._
    val fromDf = xs.toDF("x") // codegen path
      .select(sortedSuccessor(bs, col("x")).as("i"))
      .collect().map(_.getInt(0)).toSeq
    val expr = SortedSuccessor(bs,
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false))
    val fromEval = xs.map { x => // interpreted path
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(x))
        .asInstanceOf[Int]
    }
    assert(fromDf == fromEval)
  }

  test("misordered or empty boundaries fail at analysis time") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
    intercept[AnalysisException] {
      df.select(sortedSuccessor(Seq(3L, 2L), col("x"))).collect()
    }
    intercept[AnalysisException] {
      df.select(sortedSuccessor(Seq.empty, col("x"))).collect()
    }
    intercept[AnalysisException] { // duplicate = not STRICTLY increasing
      df.select(sortedSuccessor(Seq(2L, 2L), col("x"))).collect()
    }
  }

  test("null flows through, no match counts as bounds.size") {
    import spark.implicits._
    val df = Seq(Some(5L), None, Some(99L)).toDF("x")
    val got = df.select(sortedSuccessor(bounds, col("x")).as("i"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(Some(0), None, Some(4)))
  }
}
