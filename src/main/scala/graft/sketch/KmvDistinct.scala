package graft.sketch

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** KMV ("k minimum values" / bottom-k) distinct-count sketch as a custom
  * Catalyst [[TypedImperativeAggregate]].
  *
  * The buffer is the k smallest distinct hash values seen; the estimator
  * is the classic (k−1) / U₍k₎ with U₍k₎ = kth-minimum normalized over the
  * 2³² hash space (Bar-Yossef et al., RANDOM 2002). Groups with fewer
  * than k distinct hashes are counted exactly.
  *
  * Why this instead of the built-in HLL: the sketch is DETERMINISTIC over
  * the engine's own fnv1a32 kernel, so the estimate is exactly
  * reproducible in DuckDB (kth smallest distinct hash via row_number) and
  * the oracle gate can check it bit-for-bit — `approx_count_distinct`'s
  * HLL is engine-internal and only spec-boundable. Scale shape is the
  * same: fixed-size per-group state, associative-commutative merge
  * (partial aggregation map-side, one shuffle of k longs per group).
  *
  * Input must already be a hash (e.g. `fnv1a32(x)`): composing with the
  * existing kernel keeps one hash definition across engines.
  */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast() // keep the k smallest
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 4294967296.0 / buf.last.toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinct =
    copy(child = c)
}

/** The SKETCH STATE itself — the sorted k minimum distinct hashes as an
  * array — rather than the finalized estimate. This is what makes KMV an
  * ALGEBRA and not just a counter: two groups' min-arrays merge (bottom-k
  * of the union) into the union's sketch, and |K(A∪B) ∩ K(A) ∩ K(B)| / k
  * estimates Jaccard, so union size, overlap, and similarity all derive
  * from stored per-group states without revisiting the data — the
  * cross-partition/cross-day set-algebra primitive (Beyer et al.,
  * SIGMOD '07). Same buffer discipline as [[KmvDistinct]]. */
case class KmvMins(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"

  private val agg = KmvDistinct(child, k)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    agg.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    agg.update(buf, input)
  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    agg.merge(b1, b2)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    agg.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    agg.deserialize(bytes)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending: sorted
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMins =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMins =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvMins =
    copy(child = c)
}

object KmvDistinct {
  /** Distinct-count estimate of `hashed` (a hash column, e.g. fnv1a32)
    * from its k minimum values; exact below k distinct. */
  def kmvDistinct(hashed: Column, k: Int): Column =
    shims.column(KmvDistinct(shims.expression(hashed), k)
      .toAggregateExpression())

  /** The sorted k-minimum-hash state itself, for sketch set algebra. */
  def kmvMins(hashed: Column, k: Int): Column =
    shims.column(KmvMins(shims.expression(hashed), k)
      .toAggregateExpression())
}
