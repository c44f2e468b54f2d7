package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Bounded buffer of the k minimum (unsigned) 64-bit hashes seen.
  * Mergeable: union-then-truncate. */
final class KmvBuffer(val k: Int) {
  // unsigned-comparable form: h ^ Long.MinValue, kept sorted ascending
  val mins = new java.util.TreeSet[java.lang.Long]()
  // cached copy of mins.last() once the buffer is full: the overwhelmingly
  // common per-row case (hash above the current k-th minimum) then costs
  // one primitive compare instead of a boxed TreeSet.last() lookup
  private var kth: Long = Long.MaxValue

  def add(h: Long): Unit = {
    val u = h ^ Long.MinValue
    if (mins.size < k) {
      mins.add(u)
      if (mins.size == k) kth = mins.last()
    } else if (u < kth) {
      if (mins.add(u)) { mins.pollLast(); kth = mins.last() }
    }
  }

  def merge(other: KmvBuffer): Unit = {
    val it = other.mins.iterator()
    while (it.hasNext) {
      val u = it.next()
      if (mins.size < k) {
        mins.add(u)
        if (mins.size == k) kth = mins.last()
      } else if (u < kth && mins.add(u)) { mins.pollLast(); kth = mins.last() }
    }
  }

  /** KMV estimator: exact below k; else (k-1) / u_(k) with u in (0,1]. */
  def estimate: Long = {
    if (mins.size < k) mins.size.toLong
    else {
      // unsigned kth hash → uniform double in [0,1): top 53 bits exactly
      val kthUnsigned = mins.last() - Long.MinValue // wraparound back to unsigned bits
      val u = (kthUnsigned >>> 11).toDouble / (1L << 53).toDouble
      if (u <= 0.0) mins.size.toLong
      else math.round((k - 1).toDouble / u)
    }
  }
}

/** Distinct-count sketch as a [[TypedImperativeAggregate]] — the mutable
  * merge-buffer aggregate shape (partial sketches merge map-side, serialize
  * across the shuffle, and could be persisted and re-merged across jobs —
  * the property HLL-style sketches need at 100 TB).
  *
  * Deliberately simple public-domain KMV (k-minimum-values) estimator:
  * relative error ≈ 1/√(k−2). Spark's own approx_count_distinct (HLL++) is
  * the production default (q32); this demonstrates the extension surface
  * with independently-checkable math.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {
  require(k >= 8, "kmv_distinct needs k >= 8")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any = buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + buf.mins.size * 8)
    bb.putInt(buf.k).putInt(buf.mins.size)
    buf.mins.forEach(u => { bb.putLong(u); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong ^ Long.MinValue); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvDistinct =
    copy(child = cs.head)
}

object KmvDistinct {
  /** Column API: approximate distinct count via a k-minimum-values sketch. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    Bridge.column(KmvDistinct(Bridge.expression(c), k).toAggregateExpression())
}
