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

/** Aggregation state of [[CappedBlockList]]: collected members plus the
  * running gram-slot total and an explicit overflow marker. The marker
  * (not buffer size) carries the escalation decision, so an overflowed
  * group can DROP its buffered payloads immediately — state for an
  * over-cap/over-budget block is ~16 bytes resident and on the wire, not
  * cap+1 full gram sets. */
private[functions] final class BlockBuf {
  val docs = new ArrayBuffer[BlockDoc](8)
  var gramSum: Long = 0L
  var overflow: Boolean = false
  def markOverflow(): Unit = { overflow = true; docs.clear(); gramSum = 0L }
}

/** Bounded struct-collect for block-local dedup verification: gathers
  * (id, flag, n_chars, grams) members per group; a group that exceeds
  * `cap` MEMBERS or `gramBudget` total gram slots evaluates to NULL — the
  * caller routes those blocks to the LSH tier instead (see
  * Dedup.dedupNgramJaccard). The member cap bounds the quadratic verify;
  * the gram budget bounds the state in BYTES (~8·gramBudget), which a
  * member count alone cannot: cap=512 with one 100k-gram document per
  * member would otherwise hold ~400 MB of aggregation state resident and
  * serialize it whole on exchange/spill. Overflow clears the buffer, so
  * an escalated block's state costs ~16 bytes from that point on.
  * Members evaluate sorted by id so downstream pair emission is
  * deterministic regardless of arrival order.
  */
case class CappedBlockList(id: Expression, flag: Expression, nChars: Expression,
    grams: Expression, cap: Int,
    gramBudget: Long = CappedBlockList.DefaultGramBudget,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BlockBuf] {

  require(cap > 0 && gramBudget > 0,
    s"capped_block_list: cap=$cap and gramBudget=$gramBudget must be positive")

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

  override def createAggregationBuffer(): BlockBuf = new BlockBuf

  override def update(buf: BlockBuf, input: InternalRow): BlockBuf = {
    if (!buf.overflow) {
      val i = id.eval(input); val f = flag.eval(input)
      val n = nChars.eval(input); val g = grams.eval(input)
      if (i != null && f != null && n != null && g != null) {
        val ga = g.asInstanceOf[ArrayData].toLongArray()
        buf.docs += BlockDoc(i.asInstanceOf[Long], f.asInstanceOf[Int],
          n.asInstanceOf[Long], ga)
        buf.gramSum += ga.length
        if (buf.docs.length > cap || buf.gramSum > gramBudget) buf.markOverflow()
      }
    }
    buf
  }

  override def merge(buf: BlockBuf, other: BlockBuf): BlockBuf = {
    if (buf.overflow || other.overflow) buf.markOverflow()
    else {
      buf.docs ++= other.docs
      buf.gramSum += other.gramSum
      if (buf.docs.length > cap || buf.gramSum > gramBudget) buf.markOverflow()
    }
    buf
  }

  override def eval(buf: BlockBuf): Any =
    if (buf.overflow) null
    else {
      val sorted = buf.docs.sortBy(d => (d.id, d.flag))
      new GenericArrayData(sorted.map(d => InternalRow(
        d.id, d.flag, d.nChars, new GenericArrayData(d.grams))).toArray[Any])
    }

  override def serialize(buf: BlockBuf): Array[Byte] = {
    var bytes = 1 + 8 + 4
    buf.docs.foreach(d => bytes += 8 + 4 + 8 + 4 + d.grams.length * 8)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.put(if (buf.overflow) 1.toByte else 0.toByte)
    bb.putLong(buf.gramSum)
    bb.putInt(buf.docs.length)
    buf.docs.foreach { d =>
      bb.putLong(d.id); bb.putInt(d.flag); bb.putLong(d.nChars)
      bb.putInt(d.grams.length); d.grams.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BlockBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BlockBuf
    buf.overflow = bb.get() == 1.toByte
    buf.gramSum = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val id = bb.getLong; val flag = bb.getInt; val nc = bb.getLong
      val gl = bb.getInt
      val g = new Array[Long](gl)
      var j = 0
      while (j < gl) { g(j) = bb.getLong; j += 1 }
      buf.docs += BlockDoc(id, flag, nc, g)
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
  /** Default gram-slot budget per block: 2^21 slots = 16 MB of gram
    * payload resident/serialized per aggregation group at most — far
    * above any healthy block (512 members × ~1k grams ≈ 2^19), so only
    * pathological long-document blocks escalate on bytes. */
  val DefaultGramBudget: Long = 1L << 21

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
