package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Lower-bound search over a static sorted Long array, as a codegen'd
  * Catalyst expression: returns the smallest index `i` with
  * `boundaries(i) >= x`, or `boundaries.length` when `x` exceeds them all.
  *
  * This is the successor lookup of a consistent-hash ring and, generally,
  * the "which bucket of a precomputed boundary list" primitive of range
  * routing. Semantically identical to
  * `aggregate(lit(bounds), 0, (acc, b) -> acc + if(b < x, 1, 0))`, but
  * that higher-order form pays an interpreted lambda per ELEMENT —
  * measured 25 s for one pass over the sf0.1 keyspace with 256 vnodes —
  * while this compiles to an O(log n) binary-search loop inside
  * WholeStageCodegen (same pass: < 1 s).
  *
  * The boundary list is part of the expression (control-plane metadata,
  * like [[WordSetHits]]' word set); it must be strictly increasing, which
  * is checked at ANALYSIS time so a misordered ring fails before any task
  * launches rather than returning plausible wrong buckets.
  */
case class SortedSuccessor(boundaries: Seq[Long], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_successor"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"sorted_successor needs LONG input, got ${child.dataType.simpleString}")
    else if (boundaries.isEmpty)
      TypeCheckResult.TypeCheckFailure("sorted_successor needs ≥1 boundary")
    else if (boundaries.sliding(2).exists(p => p.size == 2 && p(0) >= p(1)))
      TypeCheckResult.TypeCheckFailure(
        "sorted_successor boundaries must be strictly increasing")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val arr: Array[Long] = boundaries.toArray

  /** THE search definition — generated code mirrors it exactly. */
  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) >= x) hi = mid else lo = mid + 1
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", arr, "long[]")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |int $lo = 0;
         |int $hi = $b.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($b[$mid] >= $x) $hi = $mid; else $lo = $mid + 1;
         |}
         |${ev.value} = $lo;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedSuccessor =
    copy(child = newChild)
}

object SortedSuccessor {
  /** Column API: index of the first boundary ≥ c, else bounds.size. */
  def sortedSuccessor(bounds: Seq[Long], c: Column): Column =
    shims.column(SortedSuccessor(bounds, shims.expression(c)))
}
