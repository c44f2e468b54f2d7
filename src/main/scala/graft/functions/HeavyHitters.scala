package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving frequent-items buffer (Metwally, Agrawal & El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT'05), with the mergeable-summaries combine step (Agarwal, Cormode,
  * Huang, Phillips, Wei & Yi, "Mergeable Summaries", PODS'12): two
  * capacity-k summaries merge by summing per-item (count, err) and keeping
  * the top k items by count. The classical guarantees survive the merge:
  *
  *   - every retained item's estimate OVERcounts: true ≤ est ≤ true + err,
  *     with err ≤ n/k (n = total items observed);
  *   - any item with true count > n/k is guaranteed to be retained.
  *
  * The guarantees — not the raw sketch content, which is legitimately
  * merge-order-dependent — are the deterministic surface a correctness
  * gate checks (same strategy as the KMV/HLL bound gates, q32/q47).
  */
final class SpaceSavingBuffer(val k: Int) {
  // item → (count, err); size capped at k (trim on overflow during merge)
  val items = new java.util.HashMap[String, Array[Long]]()
  var n: Long = 0L

  def add(s: String): Unit = {
    n += 1
    val cur = items.get(s)
    if (cur != null) cur(0) += 1
    else if (items.size < k) items.put(s, Array(1L, 0L))
    else {
      // replace the min-count item; inherit its count as the error bound.
      // deterministic tie-break on the item string so the buffer content
      // never depends on hash-map iteration nondeterminism across JVMs
      var minKey: String = null
      var minCount = Long.MaxValue
      val it = items.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c < minCount || (c == minCount && (minKey == null || e.getKey < minKey))) {
          minCount = c; minKey = e.getKey
        }
      }
      items.remove(minKey)
      items.put(s, Array(minCount + 1, minCount))
    }
  }

  /** A summary's pessimistic offset: the most an item ABSENT from it could
    * truly have occurred in its stream (0 while under capacity — absence
    * then means count 0; else the eviction threshold = min count). */
  private def offset: Long = {
    if (items.size < k) return 0L
    var m = Long.MaxValue
    val it = items.values().iterator()
    while (it.hasNext) { val c = it.next()(0); if (c < m) m = c }
    m
  }

  /** Merge with pessimistic offsets (the Space-Saving combine of Agarwal
    * et al., "Mergeable Summaries", PODS'12): an item absent from one side
    * contributes that side's offset to both count and error — summing with
    * absent→0 would silently UNDERcount items evicted in some partition
    * and break the est ≥ true invariant the q70 gate checks. */
  def merge(other: SpaceSavingBuffer): Unit = {
    n += other.n
    val offA = offset
    val offB = other.offset
    val itB = other.items.entrySet().iterator()
    while (itB.hasNext) {
      val e = itB.next()
      val cur = items.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else items.put(e.getKey,
        Array(offA + e.getValue()(0), offA + e.getValue()(1)))
    }
    if (offB > 0) {
      // items we hold that the (full) other side evicted
      val itA = items.entrySet().iterator()
      while (itA.hasNext) {
        val e = itA.next()
        if (!other.items.containsKey(e.getKey)) {
          e.getValue()(0) += offB; e.getValue()(1) += offB
        }
      }
    }
    if (items.size > k) {
      // keep top k by (count desc, item asc) — deterministic trim.
      // Snapshot into plain tuples first: Map.Entry views are invalid
      // once the backing map is mutated (clear()), per the Map contract.
      val snapshot = new java.util.ArrayList[(String, Array[Long])](items.size)
      val itAll = items.entrySet().iterator()
      while (itAll.hasNext) { val e = itAll.next(); snapshot.add((e.getKey, e.getValue)) }
      snapshot.sort { (a, b) =>
        val c = java.lang.Long.compare(b._2(0), a._2(0))
        if (c != 0) c else a._1.compareTo(b._1)
      }
      items.clear()
      var i = 0
      while (i < k) { items.put(snapshot.get(i)._1, snapshot.get(i)._2); i += 1 }
    }
  }
}

/** `heavy_hitters(expr, k)`: map item → overcounting estimate for the ≤ k
  * retained items of a Space-Saving summary. Partial buffers merge
  * map-side and serialize across the shuffle — the mergeable-sketch shape
  * that lets 100 TB of partitions aggregate without ever shipping raw
  * term streams. */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {
  require(k >= 4, "heavy_hitters needs k >= 4")

  // type-check AFTER analysis resolves the child — a constructor require
  // would fire on the unresolved attribute
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters takes a string column, got ${child.dataType.simpleString}")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer(k)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val entries = new java.util.ArrayList(buf.items.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val keys = new Array[Any](entries.size)
    val vals = new Array[Any](entries.size)
    var i = 0
    while (i < entries.size) {
      keys(i) = UTF8String.fromString(entries.get(i).getKey)
      vals(i) = entries.get(i).getValue()(0)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k); out.writeLong(buf.n); out.writeInt(buf.items.size)
    val it = buf.items.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: writeUTF throws on items
      // whose encoding exceeds 65535 bytes, and this aggregate is exposed
      // over arbitrary string columns (e.g. whole documents)
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    buf.n = in.readLong()
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val key = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      buf.items.put(key, Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = cs.head)
}

object HeavyHitters {
  /** Column API: Space-Saving frequent-items map (item → overcount
    * estimate, ≤ k entries, deterministic (count desc, item) key order). */
  def heavyHitters(c: Column, k: Int = 64): Column =
    Bridge.column(HeavyHittersAgg(Bridge.expression(c), k).toAggregateExpression())
}
