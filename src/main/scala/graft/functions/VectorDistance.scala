package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Distance/similarity between two numeric vectors, computed in double.
  *
  * Spark-native re-expression of the metrics the reference exposes
  * (reference: LanceVectorSearch.java:272-286 — L2 / COSINE / DOT): a
  * full-codegen Catalyst expression so KNN scans stay inside
  * WholeStageCodegen (no UDF boxing, no per-row allocation).
  *
  * Metrics (accumulation is a single left-to-right loop, which keeps
  * results bitwise-reproducible across engines for oracle comparison):
  *  - "dot":    sum(a_i*b_i)
  *  - "l2":     sqrt(sum((a_i-b_i)^2))  (euclidean)
  *  - "cosine": dot / (sqrt(sum(a_i^2)) * sqrt(sum(b_i^2)))  (similarity)
  *
  * Array elements must be float or double and non-null.
  */
case class VectorDistance(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Result is null on dimension mismatch or a null array element (the
  // reference errors on mismatched dims; null is the Spark-idiomatic
  // equivalent), so the expression is nullable even for non-null children.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!Seq("dot", "l2", "cosine").contains(metric))
      TypeCheckResult.TypeCheckFailure(s"unknown metric $metric")
    else if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_distance needs array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Per-element null checks only when the array type admits nulls — the
    * common parquet embedding column doesn't, and 2×dim isNullAt calls per
    * row would dominate the distance loop. */
  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    if (mayHaveNullElems) {
      var k = 0
      while (k < n) {
        if (a.isNullAt(k) || b.isNullAt(k)) return null
        k += 1
      }
    }
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    @inline def av(i: Int): Double = if (af) a.getFloat(i).toDouble else a.getDouble(i)
    @inline def bv(i: Int): Double = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
    var i = 0
    metric match {
      case "dot" =>
        var dot = 0.0
        while (i < n) { dot += av(i) * bv(i); i += 1 }
        dot
      case "l2" =>
        var s = 0.0
        while (i < n) { val d = av(i) - bv(i); s += d * d; i += 1 }
        math.sqrt(s)
      case "cosine" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        while (i < n) { val x = av(i); val y = bv(i); dot += x * y; na += x * x; nb += y * y; i += 1 }
        dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, i: String, isFloat: Boolean): String =
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val k = ctx.freshName("k")
      // dim mismatch / null element → null result (mirrors nullSafeEval)
      val nullElemCheck =
        if (mayHaveNullElems)
          s"""else {
             |  for (int $k = 0; $k < $n; $k++) {
             |    if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; $n = 0; break; }
             |  }
             |}""".stripMargin
        else ""
      val header =
        s"""int $n = $a.numElements();
           |if ($n != $b.numElements()) { ${ev.isNull} = true; $n = 0; }
           |$nullElemCheck""".stripMargin
      metric match {
        case "dot" =>
          s"""$header
             |double $dot = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $dot += ${getter(a, i, lf)} * ${getter(b, i, rf)};
             |}
             |${ev.value} = $dot;""".stripMargin
        case "l2" =>
          s"""$header
             |double $dot = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = ${getter(a, i, lf)} - ${getter(b, i, rf)};
             |  $dot += $x * $x;
             |}
             |${ev.value} = java.lang.Math.sqrt($dot);""".stripMargin
        case "cosine" =>
          s"""$header
             |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = ${getter(a, i, lf)};
             |  double $y = ${getter(b, i, rf)};
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));""".stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
