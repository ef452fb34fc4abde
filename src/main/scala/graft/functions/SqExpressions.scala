package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) primitives as full-codegen Catalyst
  * expressions — the missing rung of the quantization ladder between raw
  * float32 and PQ (float32 → int8 SQ → PQ → sign bits): ONE byte per
  * dimension via a per-dimension affine map [min_d, max_d] → [0, 255],
  * a 4× storage/IO cut that keeps far more precision than PQ (8 bits per
  * DIMENSION vs 4 bits per 8-dim subspace). Not in the reference (its
  * ladder stops at IVF_PQ) — added for the LLM-pipeline ANN surface.
  *
  * The per-dimension mins/scales are driver-computed constants embedded in
  * the plan via `addReferenceObj` (2×dim doubles — plan shipping cost, not
  * a broadcast). Both the build (encode) and the query-time ADC scan stay
  * inside WholeStageCodegen, like the PQ pair in [[PqEncode]]/[[PqAdc]].
  */

/** Encode a float/double vector into one byte per dimension:
  * code_d = clamp(rint((v_d − min_d) / scale_d), 0, 255); a zero scale
  * (constant dimension) encodes 0. Vectors outside the trained [min, max]
  * envelope (e.g. appended after the stats pass) clamp to the border —
  * bounded error, never a wrong-range read. Null on dimension mismatch or
  * a null element (as the PQ encode does). */
case class SqEncode(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression {

  require(mins.length == scales.length, "sq_encode: |mins| must equal |scales|")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_encode needs array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = mins.length
    if (a.numElements() != n) return null
    if (mayHaveNullElems) {
      var k = 0
      while (k < n) { if (a.isNullAt(k)) return null; k += 1 }
    }
    val isF = elemIsFloat
    val out = new Array[Byte](n)
    var d = 0
    while (d < n) {
      val v = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
      val q = if (scales(d) <= 0) 0L else Math.rint((v - mins(d)) / scales(d)).toLong
      val c = if (q < 0L) 0L else if (q > 255L) 255L else q
      out(d) = (c & 0xFFL).toByte
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sqMins", mins, "double[]")
    val sc = ctx.addReferenceObj("sqScales", scales, "double[]")
    val n = mins.length
    nullSafeCodeGen(ctx, ev, a => {
      def get(i: String): String =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val out = ctx.freshName("codes")
      val d = ctx.freshName("d"); val q = ctx.freshName("q")
      s"""if ($a.numElements() != $n${PqGen.nullElemCheck(a, n, mayHaveNullElems)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[$n];
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $q = $sc[$d] <= 0 ? 0L
         |      : (long) Math.rint((${get(d)} - $mn[$d]) / $sc[$d]);
         |    if ($q < 0L) $q = 0L; else if ($q > 255L) $q = 255L;
         |    $out[$d] = (byte) ($q & 0xFFL);
         |  }
         |  ${ev.value} = $out;
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-time asymmetric distance over SQ8 codes:
  * dist = Σ_d (qm_d − code_d · scale_d)² where qm_d = q_d − min_d is
  * precomputed driver-side — the dequantized L2² against the query with no
  * per-row decode allocation. Null on length mismatch. */
case class SqAdc(child: Expression, qm: Array[Double], scales: Array[Double])
    extends UnaryExpression {

  require(qm.length == scales.length, "sq_adc: |qm| must equal |scales|")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_adc needs binary codes, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length != qm.length) return null
    var s = 0.0
    var d = 0
    while (d < bytes.length) {
      val diff = qm(d) - (bytes(d) & 0xFF).toDouble * scales(d)
      s += diff * diff
      d += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("sqQm", qm, "double[]")
    val sc = ctx.addReferenceObj("sqScales", scales, "double[]")
    val n = qm.length
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      s"""if ($a.length != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $diff = $q[$d] - (double) ($a[$d] & 0xFF) * $sc[$d];
         |    $s += $diff * $diff;
         |  }
         |  ${ev.value} = $s;
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
