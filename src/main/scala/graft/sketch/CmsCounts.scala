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

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * custom Catalyst [[TypedImperativeAggregate]]: `depth × width` counters;
  * item frequency is estimated as the MIN over rows of the item's bucket
  * counter, which never underestimates.
  *
  * Same design rationale as [[KmvDistinct]]: the sketch is DETERMINISTIC
  * over the engine's own fnv1a32 kernel (row r hashes `item + ":" + r`),
  * so estimates are exactly reproducible in DuckDB (per-(row, bucket)
  * GROUP BY sums) and the oracle gate checks them bit-for-bit — unlike
  * engine-internal sketches which are only spec-boundable.
  *
  * Scale shape: fixed `depth*width` longs of state regardless of input
  * size, elementwise-sum merge (associative + commutative → map-side
  * partial aggregation; one buffer per map task reaches the shuffle).
  * This is the heavy-hitter primitive a 100 TB pipeline uses where an
  * exact `groupBy(item)` would shuffle every distinct item.
  */
case class CmsCounts(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && width >= 2, s"cms needs depth>=1, width>=2; got $depth x $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_counts"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      CmsCounts.add(buf, v.asInstanceOf[UTF8String].toString, depth, width)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): CmsCounts =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsCounts =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsCounts =
    copy(child = c)
}

object CmsCounts {
  /** The per-item update kernel — THE definition of the hash/bucket
    * scheme. Shared by the aggregate and the streaming state
    * ([[graft.streaming.SketchStream]]) so their bit-equality contract
    * cannot drift between two copies. */
  def add(buf: Array[Long], item: String, depth: Int, width: Int): Unit = {
    var r = 0
    while (r < depth) {
      val b = (Fnv1a32.hashString(item + ":" + r) % width).toInt
      buf(r * width + b) += 1L
      r += 1
    }
  }

  /** Flattened `depth × width` counter array of the string column `item`;
    * row-major (`sketch[r*width + b]`). Probe with [[estimate]]. */
  def cmsCounts(item: Column, depth: Int, width: Int): Column =
    shims.column(CmsCounts(shims.expression(item), depth, width)
      .toAggregateExpression())

  /** Point estimate of `item`'s frequency from a sketch column produced by
    * [[cmsCounts]]: min over rows of the item's bucket counter. Pure
    * column arithmetic over the engine's fnv1a32 — codegen-friendly and
    * oracle-reproducible. */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val per = (0 until depth).map { r =>
      val bucket = pmod(Fnv1a32.fnv1a32(concat(item, lit(":" + r))),
        lit(width.toLong))
      element_at(sketch, (lit(r * width) + bucket).cast("int") + lit(1))
    }
    least(per: _*)
  }
}
