package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-bit binarization of a float/double vector into packed 64-bit words.
  *
  * The 1-bit analog of the int8 path (`emb_quantize`) and the PQ path
  * (reference: LanceVectorSearch.java distance surface): element j
  * contributes bit (x_j > 0) to word j/64, filled left-to-right from the
  * word's MSB side (word = word*2+bit per element, so a 64-element chunk
  * occupies the full long and a partial tail chunk sits in the low bits).
  * A 64-dim float embedding (256 bytes) becomes ONE long (8 bytes) — a 32×
  * cut in what a first-pass similarity scan must read, shuffle and keep
  * resident, which at 100 TB is the difference between an in-memory
  * candidate sweep and a spilling one. Codegen'd, no per-row allocation
  * beyond the one output word array.
  */
case class BitPackSign(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bit_pack_sign needs array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 63) / 64)
    val isF = elemIsFloat // loop-invariant: one cast, not one per element
    var i = 0
    while (i < n) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      words(i / 64) = (words(i / 64) << 1) | (if (x > 0.0) 1L else 0L)
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val words = ctx.freshName("words"); val w = ctx.freshName("w")
      // NOT `(words[i/64] << 1) | (...)`: Janino misparses the
      // parenthesized shift as a cast type ("Expression ... is not a
      // type") and the whole stage silently fell back to interpreted
      // eval — split the shift and the bit-or so codegen actually runs.
      s"""int $n = $a.numElements();
         |long[] $words = new long[($n + 63) / 64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $w = $words[$i / 64] << 1;
         |  if (((double) $a.$getter($i)) > 0.0) $w |= 1L;
         |  $words[$i / 64] = $w;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two packed-bit vectors (array<long> from
  * [[BitPackSign]]): sum of Long.bitCount(a XOR b) — one popcount
  * instruction per 64 dims, the fastest similarity primitive that exists
  * (SIMD-free ~1 cycle/word). Null on word-count mismatch; codegen'd so a
  * broadcast-probe KNN scan stays inside WholeStageCodegen.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming_dist needs two array<bigint>, got $l / $r")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; $n = 0; }
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
