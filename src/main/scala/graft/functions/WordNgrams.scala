package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, as a single native
  * expression.
  *
  * Equivalent to
  * `array_distinct(transform(sequence(0, size(t)-n), i -> concat_ws(' ',
  * t[i+1], …, t[i+n])))` — and to DuckDB's
  * `list_distinct(list_transform(range(len(t)-n+1), …))`, preserving
  * first-occurrence order like both — but evaluated as one compiled loop
  * per row instead of an interpreted lambda per shingle. On a 260k-shingle
  * corpus the higher-order-function pipeline costs ~6 s; this runs in
  * ~0.2 s. Shingling feeds every shingle-based dedup operator, so it is
  * the hottest scalar kernel in the dedup family — and like its siblings
  * (`WinnowFingerprints`, `WordSetHits`) it splices a static call into
  * WholeStageCodegen instead of paying a CodegenFallback boxed-eval
  * dispatch per row.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams needs ARRAY<STRING> input, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (distinct) "word_ngrams" else "word_ngrams_all"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordNgrams$$.MODULE$$.compute($t, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  private val sep = UTF8String.fromString(" ")

  /** The shingle kernel, shared by interpreted eval and generated code.
    * `distinct = false` keeps EVERY shingle in positional order, so the
    * index of an element in the output IS the start position of that
    * shingle in the token array — the property the substring-span dedup
    * coverage derivation relies on after `posexplode`. */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val num = toks.numElements()
    if (num < n) return new GenericArrayData(Array.empty[Any])
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](num - n + 1)
    // one scratch buffer for the whole row: concatWs copies the bytes
    // immediately, so reusing it is safe and saves an allocation per
    // shingle on the hottest kernel in the dedup family
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= num - n) {
      var j = 0
      while (j < n) {
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Distinct n-gram shingles of `tokens` (array<string>). */
  def wordNgrams(tokens: Column, n: Int): Column =
    shims.column(WordNgrams(shims.expression(tokens), n))

  /** ALL n-gram shingles in positional order (output index = start
    * position) — the positional form behind span-coverage dedup. */
  def wordNgramsAll(tokens: Column, n: Int): Column =
    shims.column(WordNgrams(shims.expression(tokens), n, distinct = false))
}
