package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Integer Efraimidis–Spirakis priority key: the maximum of `w` MINSTD
  * draws g(id, j) = minstd2((minstd2(id) + j) mod M), j = 1..w, computed
  * in a native LOOP. Replaces the SQL form
  * `array_max(transform(sequence(1, w), j -> ...))`, which materializes a
  * w-element long array per row — ~800 KB of transient allocation for a
  * 100k-token document — when the loop needs eight bytes of state. Draw
  * values are BIT-IDENTICAL to the SQL form and to the DuckDB twin
  * (Sampling.weightedKeySql): same 63-bit-safe signed arithmetic, same
  * constants (A=48271, M=2^31−1), so selection order is unchanged and
  * the weighted-sampling oracles keep hash-matching.
  *
  * `w < 1` is treated as 1 (one draw) — callers filter w > 0; the clamp
  * only guards against the SQL `sequence(1, 0) = [1, 0]` surprise ever
  * being reintroduced as a semantic.
  */
case class MaxMinstdDraws(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"max_minstd_draws needs (bigint id, bigint w), got ($a, $b)")
    }

  override def nullSafeEval(id: Any, w: Any): Any =
    MaxMinstdDraws.compute(id.asInstanceOf[Long], w.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w) =>
      s"${ev.value} = graft.functions.MaxMinstdDraws.compute($id, $w);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MaxMinstdDraws {
  private final val A = 48271L
  private final val M = 2147483647L // 2^31 - 1

  /** Two MINSTD steps — the scalar twin of Sampling.minstd2 (signed `%`,
    * matching Spark's and DuckDB's remainder on the callers' non-negative
    * domain; products stay < 2^48, no overflow). */
  @inline private def minstd2(c: Long): Long = (((c * A) % M) * A) % M

  /** Weights above this are corrupt input, not sampling policy: the epoch
    * planner caps repeats far below it, and an O(w) draw loop on a
    * Long-sized w would hang the executor where the former
    * `sequence(1, w)` SQL form failed fast on oversized arrays. */
  final val MaxDraws = 1L << 24

  def compute(id: Long, w: Long): Long = {
    require(w <= MaxDraws,
      s"max_minstd_draws: weight $w exceeds the $MaxDraws draw cap — corrupt weight?")
    val s = minstd2(id)
    val n = if (w < 1L) 1L else w
    var best = Long.MinValue
    var j = 1L
    while (j <= n) {
      val d = minstd2((s + j) % M)
      if (d > best) best = d
      j += 1L
    }
    best
  }
}
