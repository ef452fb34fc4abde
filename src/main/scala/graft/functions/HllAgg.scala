package graft.functions

import graft.sources.lance.Hll
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog sketch aggregate over bigint/string values → the sketch's
  * register array as BINARY. The same dense p=11 sketch the lance stats
  * sidecar uses ([[graft.sources.lance.Hll]], ~2.3% standard error),
  * exposed as a Spark aggregate so query-side approximate distincts can
  * be SKETCHED ONCE and re-aggregated by merge — the mergeable-summaries
  * shape (windowed uniques at 100 TB merge k tiny register arrays instead
  * of re-shuffling the event stream k times). */
case class HllSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Hll] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_sketch needs bigint/int/string, got $t")
  }

  override def createAggregationBuffer(): Hll = new Hll()

  override def update(buf: Hll, input: InternalRow): Hll = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buf.addLong(l)
      case i: java.lang.Integer => buf.addLong(i.longValue())
      case s: UTF8String => buf.addUTF8String(s)
    }
    buf
  }

  override def merge(buf: Hll, other: Hll): Hll = buf.merge(other)

  override def eval(buf: Hll): Any = buf.registers.clone()

  override def serialize(buf: Hll): Array[Byte] = buf.registers
  override def deserialize(bytes: Array[Byte]): Hll = new Hll(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** Merge aggregate over already-built sketch register arrays (BINARY) —
  * the re-aggregation half of the mergeable-summaries pattern. */
case class HllMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Hll] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_merge needs binary sketches, got $t")
  }

  override def createAggregationBuffer(): Hll = new Hll()

  override def update(buf: Hll, input: InternalRow): Hll = {
    val v = child.eval(input)
    if (v != null) buf.merge(new Hll(v.asInstanceOf[Array[Byte]])) else buf
  }

  override def merge(buf: Hll, other: Hll): Hll = buf.merge(other)

  override def eval(buf: Hll): Any = buf.registers.clone()

  override def serialize(buf: Hll): Array[Byte] = buf.registers
  override def deserialize(bytes: Array[Byte]): Hll = new Hll(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** Cardinality estimate of a sketch register array. */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hll_estimate needs binary, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    new Hll(v.asInstanceOf[Array[Byte]]).estimate

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = new graft.sources.lance.Hll($b).estimate();")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
