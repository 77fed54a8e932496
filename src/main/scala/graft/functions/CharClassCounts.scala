package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass [alpha, digit, whitespace] counts over a string — the native
  * replacement for the `length(x) - length(regexp_replace(x, cls, ""))`
  * idiom, which runs one full regex ENGINE pass per class (the Simpson
  * diversity projection paid four string traversals per document; at
  * 100 TB that is four scans of every byte in the corpus against one).
  *
  * Classes are the ASCII sets the regex forms match — `[A-Za-z]`,
  * `[0-9]`, and Java/RE2 `\s` = {space, \t, \n, \x0B, \f, \r} — so the
  * rewrite is bit-identical to the regex derivation AND to the DuckDB
  * oracle. The loop walks UTF-8 BYTES: every class byte is a single-byte
  * code point, and continuation/lead bytes of multi-byte code points
  * (≥ 0x80) simply match no class, exactly like the regexes. `doGenCode`
  * inlines the byte loop into WholeStageCodegen; no regex object, no
  * per-class pass, no interpreted boundary.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"char_class_counts needs STRING input, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_class_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var (alpha, digit, space) = (0L, 0L, 0L)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      else if (b >= '0' && b <= '9') digit += 1
      else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
        b == '\f' || b == '\r') space += 1
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(alpha, digit, space))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val a = ctx.freshName("alpha")
      val d = ctx.freshName("digit")
      val sp = ctx.freshName("space")
      s"""
         |byte[] $bytes = $str.getBytes();
         |long $a = 0L; long $d = 0L; long $sp = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  if (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z')) $a++;
         |  else if ($b >= '0' && $b <= '9') $d++;
         |  else if ($b == ' ' || $b == '\\t' || $b == '\\n' || $b == 0x0B ||
         |           $b == '\\f' || $b == '\\r') $sp++;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(new long[]{$a, $d, $sp});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CharClassCounts = copy(child = newChild)
}

object CharClassCounts {
  /** [n_alpha, n_digit, n_space] of a string column, one byte-loop pass. */
  def charClassCounts(s: Column): Column =
    shims.column(CharClassCounts(shims.expression(s)))
}
