package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded collect for LSH bucket materialization: gathers up to `cap`
  * long values per group and evaluates to a SORTED array; a group that
  * exceeds `cap` evaluates to NULL instead. Unlike `collect_list` +
  * post-filter, the aggregation state itself is bounded at cap+1 elements
  * — a degenerate bucket (every near-identical doc hashing to one band
  * key) stops accumulating the moment it overflows, so a mega-bucket
  * can't grow executor state without bound at scale. The NULL result is
  * the skew guard: the caller drops overflowed buckets, which is
  * recall-safe for LSH because a true near-dup pair collides in ~all
  * bands (see Dedup.dedupMinhashLsh).
  */
case class CappedSortedList(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
    with UnaryLike[Expression] {

  private val limit = cap + 1 // size == cap+1 marks overflow

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"capped_sorted_list needs bigint, got $t")
  }

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](8)

  override def update(buf: scala.collection.mutable.ArrayBuffer[Long],
                      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length < limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.ArrayBuffer[Long],
                     other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (buf.length < limit && i < other.length) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    if (buf.length > cap) null
    else new GenericArrayData(buf.toArray.sorted)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new scala.collection.mutable.ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) buf += bb.getLong
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedSortedList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedSortedList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedSortedList =
    copy(child = newChild)
}
