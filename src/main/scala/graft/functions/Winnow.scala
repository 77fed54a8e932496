package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.hash.Fnv1a32

/** MOSS-style winnowing fingerprints of a string, as one native expression:
  * fnv1a32 of every `k`-char-gram, minimum of each `w`-hash window, then
  * distinct (first-occurrence order).
  *
  * Equivalent to the SQL pipeline
  * `array_distinct(transform(sequence(0, size(kh)-w), j ->
  * array_min(slice(kh, j+1, w))))` over
  * `kh = transform(sequence(0, length(text)-k), i ->
  * fnv1a32(substring(text, i+1, k)))` — but a single compiled loop per row
  * with zero intermediate Catalyst arrays, instead of one interpreted
  * lambda call (and a substring allocation) per character of the corpus.
  * The lambda pipeline dominated the 10× scale rehearsal at ~96× the
  * sf0.1 cost; this kernel costs O(bytes·k + kgrams·w) per document —
  * linear in corpus bytes for the engine's fixed small k and w (the SQL
  * surface exposes w, so a caller-supplied large window pays the naive
  * window-min rescans; a monotonic-deque minimum would make it O(bytes)
  * outright).
  *
  * Hashes are computed over the UTF-8 bytes of each k-char window via a
  * per-char byte-offset table, so multi-byte code points hash exactly like
  * `fnv1a32(substring(...))` does.
  *
  * `doGenCode` splices a static call to [[WinnowFingerprints.compute]]
  * into WholeStageCodegen — the row stays inside the generated stage (no
  * interpreted `eval` dispatch, no boxing at a codegen boundary); the
  * kernel itself is one JIT-compiled method either way.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"window sizes must be >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow needs STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u =>
      s"${ev.value} = graft.functions.WinnowFingerprints$$.MODULE$$" +
        s".compute($u, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** The winnowing kernel — called from both the interpreted `eval` path
    * and the generated code (one static-shaped call per row). */
  def compute(u: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = u.getBytes
    val numChars = u.numChars()
    val m = numChars - k + 1 // k-gram count
    if (m < w) return new GenericArrayData(Array.empty[Any])

    // byte offset of each character (UTF-8 continuation bytes are 10xxxxxx)
    val offs = new Array[Int](numChars + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) { offs(ci) = bi; ci += 1 }
      bi += 1
    }
    offs(numChars) = bytes.length

    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = Fnv1a32.hashBytes(bytes, offs(i), offs(i + k))
      i += 1
    }

    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= m - w) {
      var mn = hashes(j)
      var t = j + 1
      while (t < j + w) {
        if (hashes(t) < mn) mn = hashes(t)
        t += 1
      }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints of `text`: k-gram size `k`, window `w`. */
  def winnow(text: Column, k: Int, w: Int): Column =
    shims.column(WinnowFingerprints(shims.expression(text), k, w))
}
