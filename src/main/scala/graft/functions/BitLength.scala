package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Binary bit length of a long — `64 − numberOfLeadingZeros(x)`, so
  * 0 → 0, 1 → 1, 2..3 → 2, and generally ⌊log2(x)⌋ + 1 for x > 0.
  * Negative inputs are their 64-bit two's-complement pattern → 64.
  *
  * This is the HLL rank primitive (rank = W+1 − bitLength over a W-bit
  * hash window) and the integer form of "which power-of-two bucket".
  * The built-in route — `length(conv(x, 10, 2))` — allocates and scans
  * a radix-conversion STRING per row and disagrees at zero (conv gives
  * "0", length 1); this compiles to a single intrinsic
  * (`Long.numberOfLeadingZeros` → LZCNT) inside WholeStageCodegen.
  */
case class BitLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bit_length64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bit_length64 needs LONG input, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  /** THE definition — generated code mirrors it exactly. */
  override protected def nullSafeEval(input: Any): Any =
    64 - java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = 64 - java.lang.Long.numberOfLeadingZeros($x);")

  override protected def withNewChildInternal(newChild: Expression): BitLength =
    copy(child = newChild)
}

object BitLength {
  /** Column API: bit length of a LONG (0 → 0). */
  def bitLength64(c: Column): Column =
    shims.column(BitLength(shims.expression(c)))
}
