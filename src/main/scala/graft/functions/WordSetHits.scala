package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of tokens belonging to a small fixed word set —
  * `size(filter(tokens, w => w.isin(words)))` as one native expression.
  *
  * The HOF form evaluates an interpreted lambda (with a linear `isin`
  * scan) per token; language-ID votes run it four times per document, so
  * it is the hottest kernel of the text-analysis family. Here the set is
  * a hash set built once per expression instance and each token is one
  * probe, and `doGenCode` inlines the probe loop into WholeStageCodegen
  * (the set rides along as a reference object), so rows never cross an
  * interpreted-eval boundary. Counts OCCURRENCES (duplicates included),
  * exactly like the `list_filter`/`list_contains` DuckDB oracle.
  */
case class WordSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty, "word set must not be empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_set_hits needs ARRAY<STRING> input, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_set_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val num = toks.numElements()
    var n = 0L
    var i = 0
    while (i < num) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, toks => {
      val i = ctx.freshName("i")
      val num = ctx.freshName("num")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $num = $toks.numElements();
         |long $cnt = 0L;
         |for (int $i = 0; $i < $num; $i++) {
         |  if (!$toks.isNullAt($i) && $setRef.contains($toks.getUTF8String($i))) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetHits =
    copy(child = newChild)
}

object WordSetHits {
  /** Count of elements of `tokens` (array<string>) that are in `words`. */
  def wordSetHits(tokens: Column, words: Seq[String]): Column =
    shims.column(WordSetHits(shims.expression(tokens), words))
}
