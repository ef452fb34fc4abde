package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** One member document of a dedup block: id, neighbor-emission flag
  * (0 = own length bucket, 1 = emitted into the next bucket), length, and
  * the sorted-distinct hashed gram set. */
private[functions] final case class BlockDoc(id: Long, flag: Int, nChars: Long,
                                             grams: Array[Long])

/** Bounded struct-collect for block-local dedup verification: gathers up
  * to `cap` (id, flag, n_chars, grams) members per group; a group that
  * exceeds `cap` evaluates to NULL — the caller routes those blocks to
  * the LSH tier instead (see Dedup.dedupNgramJaccard). Like
  * [[CappedSortedList]], the aggregation state itself is bounded: an
  * over-cap block stops accumulating (and stops buffering gram payloads)
  * the moment it overflows. Members evaluate sorted by id so downstream
  * pair emission is deterministic regardless of arrival order.
  */
case class CappedBlockList(id: Expression, flag: Expression, nChars: Expression,
    grams: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[BlockDoc]] {

  private val limit = cap + 1 // size == cap+1 marks overflow

  override def children: Seq[Expression] = Seq(id, flag, nChars, grams)

  override def dataType: DataType = CappedBlockList.ListType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (id.dataType, flag.dataType, nChars.dataType, grams.dataType) match {
      case (LongType, IntegerType, LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"capped_block_list needs (bigint, int, bigint, array<long>), got $other")
    }

  override def createAggregationBuffer(): ArrayBuffer[BlockDoc] =
    new ArrayBuffer[BlockDoc](8)

  override def update(buf: ArrayBuffer[BlockDoc], input: InternalRow): ArrayBuffer[BlockDoc] = {
    if (buf.length < limit) {
      val i = id.eval(input); val f = flag.eval(input)
      val n = nChars.eval(input); val g = grams.eval(input)
      if (i != null && f != null && n != null && g != null)
        buf += BlockDoc(i.asInstanceOf[Long], f.asInstanceOf[Int],
          n.asInstanceOf[Long], g.asInstanceOf[ArrayData].toLongArray())
    }
    buf
  }

  override def merge(buf: ArrayBuffer[BlockDoc], other: ArrayBuffer[BlockDoc]): ArrayBuffer[BlockDoc] = {
    var i = 0
    while (buf.length < limit && i < other.length) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: ArrayBuffer[BlockDoc]): Any =
    if (buf.length > cap) null
    else {
      val sorted = buf.sortBy(d => (d.id, d.flag))
      new GenericArrayData(sorted.map(d => InternalRow(
        d.id, d.flag, d.nChars, new GenericArrayData(d.grams))).toArray[Any])
    }

  override def serialize(buf: ArrayBuffer[BlockDoc]): Array[Byte] = {
    var bytes = 4
    buf.foreach(d => bytes += 8 + 4 + 8 + 4 + d.grams.length * 8)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.length)
    buf.foreach { d =>
      bb.putLong(d.id); bb.putInt(d.flag); bb.putLong(d.nChars)
      bb.putInt(d.grams.length); d.grams.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[BlockDoc] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[BlockDoc](n)
    var i = 0
    while (i < n) {
      val id = bb.getLong; val flag = bb.getInt; val nc = bb.getLong
      val gl = bb.getInt
      val g = new Array[Long](gl)
      var j = 0
      while (j < gl) { g(j) = bb.getLong; j += 1 }
      buf += BlockDoc(id, flag, nc, g)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedBlockList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedBlockList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), flag = newChildren(1), nChars = newChildren(2),
      grams = newChildren(3))
}

object CappedBlockList {
  private[functions] val ListType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("flag", IntegerType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("grams", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)
}

/** Block-local verified pair emission: for every unordered member pair of
  * a [[CappedBlockList]] block, applies the neighbor-dedup flag rule
  * (skip when BOTH members were emitted into this block as their
  * next-bucket variant — that pair also meets in its own bucket), the
  * ±`lenBand` length constraint, and the EXACT sorted-set Jaccard (the
  * identical merge walk as [[SortedJaccard]], so emitted values are
  * bit-for-bit what the join-based verify would produce), emitting
  * (a_id, b_id, jaccard) for pairs at or above `tau`. Each surviving
  * pair is emitted exactly once across all blocks: same-bucket pairs
  * only from the own-bucket block, cross-bucket pairs only from the one
  * block both belong to. No join, no candidate materialization — the
  * quadratic term is bounded by the block cap.
  */
case class VerifiedBlockPairs(items: Expression, lenBand: Long, tau: Double)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(items)

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (items.dataType == CappedBlockList.ListType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"verified_block_pairs needs capped_block_list output, got ${items.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = items.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val ids = new Array[Long](n)
    val flags = new Array[Int](n)
    val lens = new Array[Long](n)
    val grams = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 4)
      ids(i) = row.getLong(0); flags(i) = row.getInt(1); lens(i) = row.getLong(2)
      grams(i) = row.getArray(3).toLongArray()
      i += 1
    }
    val out = new ArrayBuffer[InternalRow]()
    i = 0
    while (i < n - 1) {
      var j = i + 1
      while (j < n) {
        if (ids(i) != ids(j) && !(flags(i) == 1 && flags(j) == 1) &&
            math.abs(lens(i) - lens(j)) <= lenBand) {
          val jac = VerifiedBlockPairs.jaccard(grams(i), grams(j))
          if (jac >= tau) out += InternalRow(ids(i), ids(j), jac)
        }
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(items = newChildren(0))
}

object VerifiedBlockPairs {
  /** The [[SortedJaccard]] merge walk over primitive arrays. */
  private[functions] def jaccard(a: Array[Long], b: Array[Long]): Double = {
    val na = a.length; val nb = b.length
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
