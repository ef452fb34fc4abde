package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `mmr_select(cands, pairs, k)` — the greedy Maximal Marginal Relevance
  * selection (Carbonell & Goldstein 1998) over ONE query's candidate set,
  * as a single expression: at each of k steps pick the unselected
  * candidate maximizing relevance − redundancy, here in the λ = 0.5
  * order-equivalent integer form `qsim_micro − max_{s ∈ selected}
  * psim_micro` (the first pick has no selected set and scores its plain
  * qsim). PURE INTEGER arithmetic end to end — every similarity arrives
  * pre-rounded to micro-units from the same codegen'd cosine the knn gate
  * proves cross-engine, so the selection is deterministic by construction
  * (ties break on lower doc_id).
  *
  * Inputs are the per-query rank-sorted collect shapes:
  *  - `cands`: array<struct<rnk int, doc_id long, qsim long>> (rank order)
  *  - `pairs`: array<struct<ai int, bi int, psim long>> — candidate-pair
  *    similarities keyed by RANK (dense, ai ≠ bi)
  * Output: array<struct<doc_id long, rk long, qsim long, mmr long>> in
  * pick order. O(k·n) after an O(n²) matrix load; n is the per-query
  * candidate budget (bounded — the k-heap upstream enforces it). */
case class MmrSelect(cands: Expression, pairs: Expression, k: Int)
    extends BinaryExpression {

  override def left: Expression = cands
  override def right: Expression = pairs

  override def dataType: DataType = MmrSelect.OutType

  override def checkInputDataTypes(): TypeCheckResult = (cands.dataType, pairs.dataType) match {
    case (ArrayType(_: StructType, _), ArrayType(_: StructType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"mmr_select needs two array<struct> inputs, got $l / $r")
  }

  override def nullSafeEval(c: Any, p: Any): Any =
    MmrSelect.select(c.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // via MODULE$, not a static forwarder (see LmDocScore)
    defineCodeGen(ctx, ev, (c, p) =>
      s"graft.functions.MmrSelect$$.MODULE$$.select($c, $p, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(cands = newLeft, pairs = newRight)
}

object MmrSelect {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("rk", LongType, nullable = false),
    StructField("qsim", LongType, nullable = false),
    StructField("mmr", LongType, nullable = false))), containsNull = false)

  /** Static so interpreted eval and generated code share the arithmetic. */
  def select(cands: ArrayData, pairs: ArrayData, k: Int): GenericArrayData = {
    val n = cands.numElements()
    val doc = new Array[Long](n)
    val qsim = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = cands.getStruct(i, 3)
      // rank order is the array order (sort_array upstream); rnk is 1-based
      doc(r.getInt(0) - 1) = r.getLong(1)
      qsim(r.getInt(0) - 1) = r.getLong(2)
      i += 1
    }
    // dense rank-indexed pair matrix; absent cells never read (ai != bi
    // upstream, and the greedy only consults selected columns)
    val psim = new Array[Long](n * n)
    var j = 0
    val m = pairs.numElements()
    while (j < m) {
      val r = pairs.getStruct(j, 3)
      psim((r.getInt(0) - 1) * n + (r.getInt(1) - 1)) = r.getLong(2)
      j += 1
    }
    val selected = new Array[Boolean](n)
    // maxp(i): max pair-sim from candidate i into the selected set so far
    val maxp = new Array[Long](n)
    java.util.Arrays.fill(maxp, Long.MinValue)
    val steps = math.min(k, n)
    val out = new Array[AnyRef](steps)
    var s = 0
    while (s < steps) {
      var best = -1
      var bestScore = 0L
      i = 0
      while (i < n) {
        if (!selected(i)) {
          val score = if (s == 0) qsim(i) else qsim(i) - maxp(i)
          if (best < 0 || score > bestScore ||
              (score == bestScore && doc(i) < doc(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      selected(best) = true
      out(s) = new GenericInternalRow(
        Array[Any](doc(best), (s + 1).toLong, qsim(best), bestScore))
      // fold the new pick into every remaining candidate's redundancy max
      i = 0
      while (i < n) {
        if (!selected(i)) {
          val p = psim(i * n + best)
          if (p > maxp(i)) maxp(i) = p
        }
        i += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}
