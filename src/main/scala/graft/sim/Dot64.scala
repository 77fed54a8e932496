package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Ordered dot product of two numeric arrays in double precision, as a
  * codegen'd Catalyst expression.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)` —
  * the strict left-fold `((0 + x₁y₁) + x₂y₂) + …` — but ~50× faster: the
  * higher-order-function form evaluates an interpreted lambda per element,
  * while this compiles to a tight Java loop inside WholeStageCodegen.
  * Keeping the exact fold order matters: results stay bit-identical to the
  * DuckDB oracle's `list_reduce` (see graft.oracle.Ora.dot64).
  *
  * Accepts float or double element types on either side (embeddings are
  * float32; hyperplane literals are double).
  */
case class Dot64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot64"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot64 needs array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(aa.numElements(), bb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bf) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dot64 =
    copy(left = newLeft, right = newRight)
}

object Dot64 {
  def dot64(a: Column, b: Column): Column =
    shims.column(Dot64(shims.expression(a), shims.expression(b)))
}
