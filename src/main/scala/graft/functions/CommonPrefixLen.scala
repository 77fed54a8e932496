package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level longest-common-prefix length of two strings, as a codegen
  * Catalyst expression — the front-coding primitive
  * (`kv_prefix_compress_est`).
  *
  * Semantically equal on ASCII to the HOF formulation
  * `array_position(zip_with(split(a,''), split(b,''), …), 0) - 1`, but
  * that route allocates two char arrays plus a zipped struct array PER
  * ROW and runs an interpreted lambda per character; this is one fused
  * byte loop inside WholeStageCodegen (the Dot64 precedent). Byte-level
  * is also the semantically RIGHT unit for front-coding — the stored
  * suffix is bytes — and coincides with the char-level oracle on the
  * ASCII keyspace (the same scope contract as fnv1a32).
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "common_prefix_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"common_prefix_len needs (string, string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    val n = math.min(x.numBytes(), y.numBytes())
    var i = 0
    while (i < n && x.getByte(i) == y.getByte(i)) i += 1
    i.toLong
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numBytes(), $b.numBytes());
         |int $i = 0;
         |while ($i < $n && $a.getByte($i) == $b.getByte($i)) $i++;
         |${ev.value} = (long) $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  def commonPrefixLen(a: Column, b: Column): Column =
    shims.column(CommonPrefixLen(shims.expression(a), shims.expression(b)))
}
