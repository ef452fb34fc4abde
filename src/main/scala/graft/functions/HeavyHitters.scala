package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters state: bounded counter map + the total
  * decrement depth `d` (every row's true count is within [count, count+d]
  * — `d` only grows when counters are evicted, so it IS the per-group
  * error bound, reported to the caller instead of hidden). */
private[functions] final class MgState(val capacity: Int) {
  val counts = new java.util.HashMap[Long, Long]()
  var d: Long = 0L

  def add(item: Long): Unit = {
    val c = counts.get(item)
    if (c != 0L || counts.containsKey(item)) counts.put(item, c + 1)
    else if (counts.size < capacity) counts.put(item, 1L)
    else {
      // decrement-all round: every counter loses 1, zeros evict
      d += 1
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1)
      }
    }
  }

  /** Guarantee-preserving merge (Agarwal et al., Mergeable Summaries):
    * sum counters, then subtract the (capacity+1)-th largest combined
    * count from every counter and evict non-positives. */
  def mergeWith(other: MgState): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    d += other.d
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      val vi = counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - capacity - 1) // (capacity+1)-th largest
      d += cut
      val ci = counts.entrySet().iterator()
      while (ci.hasNext) {
        val e = ci.next()
        if (e.getValue <= cut) ci.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** `heavy_hitters(item, k, capacity)` — mergeable Misra-Gries top-k over
  * BIGINT items as a [[TypedImperativeAggregate]]: aggregation state is
  * bounded at `capacity` counters per group NO MATTER the group's
  * cardinality (map-side partials merge associatively through the
  * guarantee-preserving subtract-and-evict), which is what replaces an
  * exact count-distinct-sized groupBy at 100 TB. Evaluates to the top-k
  * (count DESC, item ASC) as structs `(item, count_lo, count_hi)` where
  * `count_lo <= true count <= count_hi` and `count_hi - count_lo` is the
  * group's accumulated decrement depth — the MG bound `n/(capacity+1)`
  * surfaced per group instead of assumed. Every item with true count
  * above that depth is guaranteed present. With capacity >= the group's
  * distinct items, the sketch IS exact (d stays 0).
  */
case class HeavyHitters(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgState] with UnaryLike[Expression] {
  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("count_lo", LongType, nullable = false),
    StructField("count_hi", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"heavy_hitters needs bigint items, got $t")
  }

  override def createAggregationBuffer(): MgState = new MgState(capacity)

  override def update(buf: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MgState, other: MgState): MgState = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: MgState): Any = {
    val entries = new Array[(Long, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val top = entries.sortBy { case (item, c) => (-c, item) }.take(k)
    new GenericArrayData(top.map { case (item, c) =>
      InternalRow(item, c, c + buf.d)
    }.toArray[Any])
  }

  override def serialize(buf: MgState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + buf.counts.size * 16)
    bb.putLong(buf.d)
    bb.putInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new MgState(capacity)
    st.d = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) { st.counts.put(bb.getLong, bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}
