package graft.sketch

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.hash.Fnv1a32

/** Bloom filter (Bloom, CACM 1970) as a custom Catalyst
  * [[TypedImperativeAggregate]]: an `mBits`-bit array; an item sets
  * `kHashes` bits, membership tests all of them — no false negatives,
  * false positives at the classic `(1 - e^{-kn/m})^k` rate.
  *
  * Same design rationale as [[KmvDistinct]] and [[CmsCounts]]: probe `i`
  * hashes `item + ":" + i` through the engine's own fnv1a32 kernel, so
  * the EXACT bit pattern — including which false positives fire — is
  * reproducible in DuckDB (a distinct set of set-bit positions) and the
  * oracle gate checks the probe results bit-for-bit.
  *
  * Scale shape: fixed `mBits/64` longs of state regardless of input
  * size, bitwise-OR merge (associative + commutative → map-side partial
  * aggregation). This is the distributed semi-join primitive: build the
  * filter over the small side, broadcast 512 bytes, and discard the big
  * side's non-members before any shuffle — where an exact pre-join set
  * would broadcast the whole small side's key set.
  */
case class BloomBits(child: Expression, mBits: Int, kHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(mBits >= 64 && mBits % 64 == 0 && kHashes >= 1,
    s"bloom needs mBits % 64 = 0, kHashes >= 1; got $mBits/$kHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bits"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < kHashes) {
        val bit = (BloomBits.mix(Fnv1a32.hashString(item + ":" + i))
          % mBits).toInt
        buf(bit >> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBits =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBits =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBits =
    copy(child = c)
}

object BloomBits {
  /** Xor-fold finalizer over the 32-bit hash. Taking `h % 2^k` directly
    * would read only FNV-1a's low bits, whose weak avalanche correlates
    * the k probes of one item (same-prefix hashes) — measured ~3× the
    * analytic false-positive rate; folding the high half in restores it
    * (same reason the LSH hyperplanes read bit 16, not bit 0). */
  def mix(h: Long): Long = h ^ (h >>> 16)

  /** `mBits`-bit filter over the string column `item`, as `mBits/64`
    * longs (word `bit >> 6`, bit `bit & 63`). Probe with
    * [[mightContain]]. */
  def bloomBits(item: Column, mBits: Int, kHashes: Int): Column =
    shims.column(BloomBits(shims.expression(item), mBits, kHashes)
      .toAggregateExpression())

  /** Membership probe against a filter column produced by [[bloomBits]]:
    * true iff all `kHashes` probe bits are set. Pure column arithmetic
    * over the engine's fnv1a32 — codegen-friendly and
    * oracle-reproducible. */
  def mightContain(bloom: Column, item: Column, mBits: Int,
      kHashes: Int): Column = {
    import org.apache.spark.sql.functions._
    (0 until kHashes).map { i =>
      val h = Fnv1a32.fnv1a32(concat(item, lit(":" + i)))
      val bit = pmod(h.bitwiseXOR(shiftright(h, 16)), lit(mBits.toLong))
      val word = element_at(bloom, shiftright(bit, 6).cast("int") + lit(1))
      // functions.shiftright only takes a literal shift amount; the SQL
      // builtin accepts a column for the per-item bit offset
      (call_function("shiftright", word,
        bit.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)
  }
}
