package graft.hash

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{lit, pmod}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash over the UTF-8 bytes of a string, as a native
  * Catalyst expression (codegen'd — stays inside WholeStageCodegen, unlike a
  * Scala UDF).
  *
  * This is the one custom scalar function the reference engine demands: its
  * key→shard placement is `FNV-1a32(key) mod numShards` (reference:
  * `internal/coordinator/shard_registry.go:372-379`, `internal/shard/
  * shard.go:402-414`) and no Spark built-in (`hash`, `xxhash64`, `crc32`)
  * computes FNV-1a. Result is the unsigned 32-bit hash widened to a
  * non-negative Long, matching Go's `int(h.Sum32())` on 64-bit platforms.
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {

  // reject non-string input at ANALYSIS time; without this a LongType
  // child passes the analyzer and the codegen template splices
  // `long.getBytes()` — a mid-query compile/ClassCastException instead
  // of a clear AnalysisException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a32 needs STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fnv1a32"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a32.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hash.Fnv1a32.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
    copy(child = newChild)
}

object Fnv1a32 {
  final val OffsetBasis = 2166136261L
  final val Prime = 16777619L

  /** Hot-path kernel, called from both interpreted eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long =
    hashBytes(bytes, 0, bytes.length)

  /** Ranged variant — THE hash definition; the winnowing kernel hashes
    * sub-windows through this so the two cannot drift. */
  def hashBytes(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = OffsetBasis
    var i = from
    while (i < until) {
      h = ((h ^ (bytes(i) & 0xffL)) * Prime) & 0xffffffffL
      i += 1
    }
    h
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Column API: fnv1a32(key) → LongType in [0, 2^32). */
  def fnv1a32(c: Column): Column =
    shims.column(Fnv1a32(shims.expression(c)))

  /** key → shard id, reference semantics (numShards defaults to 4,
    * `cmd/coordinator/main.go:219-232`). Hash is non-negative so `pmod`
    * matches Go's `%` exactly. */
  def shardId(c: Column, numShards: Int = 4): Column =
    pmod(fnv1a32(c), lit(numShards.toLong))
}
