package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization primitives as full-codegen Catalyst expressions, so
  * both the index build (encode) and the query-time ADC scan stay inside
  * WholeStageCodegen — no UDF boxing on the hot path (reference:
  * LanceIndexBuilder.java IVF_PQ num-sub-vectors/num-bits; the ADC scan is
  * the query path of LanceVectorSearch).
  *
  * The codebooks/LUT are driver-computed constants embedded in the plan via
  * `addReferenceObj` (M×2^bits×subDim doubles ≈ a few KB — plan shipping
  * cost, not a broadcast).
  */

/** Encode a float/double vector into M sub-space code ids:
  * codes[m] = argmin_c ||v[m*subDim..)·· − codebook[m][c]||², first index
  * winning ties. `codebooks` is flattened [m][code][dim] row-major. */
case class PqEncode(child: Expression, codebooks: Array[Double],
                    m: Int, codes: Int, subDim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // null on dimension mismatch

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // A null ELEMENT nulls the result (as VectorDistance does) — silently
  // reading it as 0.0 would encode a wrong-but-plausible code. Checked only
  // when the array type admits nulls, so parquet's containsNull=false
  // embeddings skip the per-element branch.
  private def mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    if (mayHaveNullElems) {
      var k = 0
      while (k < m * subDim) { if (a.isNullAt(k)) return null; k += 1 }
    }
    val isF = elemIsFloat
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codes) {
        val base = (mm * codes + c) * subDim
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val v = if (isF) a.getFloat(mm * subDim + d).toDouble else a.getDouble(mm * subDim + d)
          val diff = v - codebooks(base + d)
          s += diff * diff
          d += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(mm) = best
      mm += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      def get(i: String): String =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val out = ctx.freshName("codes")
      val mm = ctx.freshName("m"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val s = ctx.freshName("s"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""if ($a.numElements() != ${m * subDim}${PqGen.nullElemCheck(a, m * subDim, mayHaveNullElems)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$m];
         |  for (int $mm = 0; $mm < $m; $mm++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $codes; $c++) {
         |      int $base = ($mm * $codes + $c) * $subDim;
         |      double $s = 0.0;
         |      for (int $d = 0; $d < $subDim; $d++) {
         |        double $diff = ${get(s"$mm * $subDim + $d")} - $cb[$base + $d];
         |        $s += $diff * $diff;
         |      }
         |      if ($s < $bestD) { $bestD = $s; $best = $c; }
         |    }
         |    $out[$mm] = $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime + codegen helpers shared by the PQ expressions. */
object PqGen {
  /** True when any of the first `n` elements is null — called from
    * generated code (one call guarding the main loop, only emitted when
    * the array type admits null elements). */
  def hasNullElem(a: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** A `|| hasNullElem(...)` clause for the dim-check condition; empty when
    * the array type cannot hold null elements (the parquet-embedding fast
    * path pays nothing). */
  private[functions] def nullElemCheck(a: String, n: Int, enabled: Boolean): String =
    if (!enabled) ""
    else s" || graft.functions.PqGen$$.MODULE$$.hasNullElem($a, $n)"

  /** True when any of the first `m` code values falls outside [0, codes) —
    * an out-of-range code would index past (or into a neighboring
    * subspace of) the codebook matrix; malformed input degrades to null
    * like every other arity/null case, never an AIOOBE or a silently
    * wrong distance. */
  def hasBadCode(a: ArrayData, m: Int, codes: Int): Boolean = {
    var i = 0
    while (i < m) {
      val c = a.getInt(i)
      if (c < 0 || c >= codes) return true
      i += 1
    }
    false
  }

  /** A `|| hasBadCode(...)` clause for generated guard conditions. */
  private[functions] def codeRangeCheck(a: String, m: Int, codes: Int): String =
    s" || graft.functions.PqGen$$.MODULE$$.hasBadCode($a, $m, $codes)"
}

/** Nearest-centroid cell assignment: argmin_c ||v − centroids[c]||², first
  * index winning ties — the incremental-append path of index maintenance
  * (reference: LanceIndexBuilder.java:116-152 append-then-reindex). The
  * flattened [cell][dim] centroid matrix is a driver constant shipped via
  * `addReferenceObj`, exactly like [[PqEncode]]'s codebooks, so assignment
  * stays inside WholeStageCodegen with primitive array access — no per-row
  * boxed UDF on the append hot path. */
case class NearestCell(child: Expression, centroids: Array[Double],
                       cells: Int, dim: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // null on dimension mismatch

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell needs array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // null element → null result (not a silent 0.0); checked only when the
  // array type admits nulls, as in VectorDistance
  private def mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    if (mayHaveNullElems && PqGen.hasNullElem(a, dim)) return null
    val isF = elemIsFloat
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cells) {
      val base = c * dim
      var s = 0.0
      var d = 0
      while (d < dim) {
        val v = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
        val diff = v - centroids(base + d)
        s += diff * diff
        d += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cellCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      def get(i: String): String =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val s = ctx.freshName("s"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""if ($a.numElements() != $dim${PqGen.nullElemCheck(a, dim, mayHaveNullElems)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cells; $c++) {
         |    int $base = $c * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      double $diff = ${get(s"$d")} - $cb[$base + $d];
         |      $s += $diff * $diff;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance between a PQ code array (left) and a RAW query vector
  * (right) — the batch-retrieval form of [[PqAdc]]: a single-query search
  * precomputes one driver-side LUT, but a KNN JOIN scores millions of
  * (query, candidate) pairs with distinct query vectors, so the lookup
  * table cannot be a plan constant. Instead the codebooks ship once via
  * `addReferenceObj` and each pair reconstructs its distance directly:
  * sqrt(Σ_m ||q_sub(m) − codebook[m][code_m]||²) — O(dim) per pair, same
  * arithmetic cost as an exact distance, but the CORPUS side of the join
  * carries only the M-int code array instead of the full float vector,
  * which is the ~(4·dim)/(4·M)× shuffle-byte cut that keeps a 100 TB
  * cell join from spilling. Null on code/dim arity mismatch, null
  * elements, or out-of-range codes. */
case class PqAdcPair(left: Expression, right: Expression,
                     codebooks: Array[Double], m: Int, codes: Int, subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_pair needs (array<int> codes, array<float|double> query), got $l / $r")
  }

  private def queryIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def codesMayHaveNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private def queryMayHaveNulls: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val cd = l.asInstanceOf[ArrayData]
    val q = r.asInstanceOf[ArrayData]
    if (cd.numElements() != m || q.numElements() != m * subDim) return null
    if (codesMayHaveNulls && PqGen.hasNullElem(cd, m)) return null
    if (queryMayHaveNulls && PqGen.hasNullElem(q, m * subDim)) return null
    if (PqGen.hasBadCode(cd, m, codes)) return null
    val isF = queryIsFloat
    var sum = 0.0
    var mm = 0
    while (mm < m) {
      val base = (mm * codes + cd.getInt(mm)) * subDim
      var d = 0
      while (d < subDim) {
        val qi = mm * subDim + d
        val v = if (isF) q.getFloat(qi).toDouble else q.getDouble(qi)
        val diff = v - codebooks(base + d)
        sum += diff * diff
        d += 1
      }
      mm += 1
    }
    math.sqrt(sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, (cd, q) => {
      def get(i: String): String =
        if (queryIsFloat) s"(double) $q.getFloat($i)" else s"$q.getDouble($i)"
      val sum = ctx.freshName("sum"); val mm = ctx.freshName("m")
      val d = ctx.freshName("d"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""if ($cd.numElements() != $m || $q.numElements() != ${m * subDim}${
             PqGen.nullElemCheck(cd, m, codesMayHaveNulls)}${
             PqGen.nullElemCheck(q, m * subDim, queryMayHaveNulls)}${
             PqGen.codeRangeCheck(cd, m, codes)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $mm = 0; $mm < $m; $mm++) {
         |    int $base = ($mm * $codes + $cd.getInt($mm)) * $subDim;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      double $diff = ${get(s"$mm * $subDim + $d")} - $cb[$base + $d];
         |      $sum += $diff * $diff;
         |    }
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($sum);
         |}""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The `p` nearest centroid ids of a vector, ordered by ascending distance
  * (ties to the lower cell id) — the probe-selection step of a distributed
  * KNN JOIN, evaluated per QUERY row inside codegen (the single-query
  * paths pick probes driver-side; a batch of millions of queries cannot).
  * Insertion sort over the p-slot result arrays: O(cells·dim + cells·p)
  * per row with p small. Returns min(p, cells) ids; null on dim mismatch. */
case class NearestCells(child: Expression, centroids: Array[Double],
                        cells: Int, dim: Int, p: Int) extends UnaryExpression {
  // fail fast at construction: p <= 0 would AIOOBE mid-query on every row
  // (zero-length heap arrays indexed at filled - 1)
  require(p > 0 && cells > 0 && dim > 0,
    s"nearest_cells needs p > 0, cells > 0, dim > 0 (got p=$p, cells=$cells, dim=$dim)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // null element → null result (not a silent 0.0); checked only when the
  // array type admits nulls, as in VectorDistance
  private def mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    if (mayHaveNullElems && PqGen.hasNullElem(a, dim)) return null
    val isF = elemIsFloat
    val pp = math.min(p, cells)
    val ids = new Array[Int](pp)
    val ds = new Array[Double](pp)
    var filled = 0
    var c = 0
    while (c < cells) {
      val base = c * dim
      var s = 0.0
      var d = 0
      while (d < dim) {
        val v = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
        val diff = v - centroids(base + d)
        s += diff * diff
        d += 1
      }
      if (filled < pp || s < ds(filled - 1)) {
        var pos = if (filled < pp) filled else pp - 1
        while (pos > 0 && ds(pos - 1) > s) {
          ds(pos) = ds(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        ds(pos) = s; ids(pos) = c
        if (filled < pp) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(ids, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cellCentroids", centroids, "double[]")
    val pp = math.min(p, cells)
    nullSafeCodeGen(ctx, ev, a => {
      def get(i: String): String =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff"); val pos = ctx.freshName("pos")
      val ids = ctx.freshName("ids"); val ds = ctx.freshName("ds")
      val filled = ctx.freshName("filled")
      s"""if ($a.numElements() != $dim${PqGen.nullElemCheck(a, dim, mayHaveNullElems)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $ids = new int[$pp];
         |  double[] $ds = new double[$pp];
         |  int $filled = 0;
         |  for (int $c = 0; $c < $cells; $c++) {
         |    int $base = $c * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      double $diff = ${get(s"$d")} - $cb[$base + $d];
         |      $s += $diff * $diff;
         |    }
         |    if ($filled < $pp || $s < $ds[$filled - 1]) {
         |      int $pos = ($filled < $pp) ? $filled : $pp - 1;
         |      while ($pos > 0 && $ds[$pos - 1] > $s) {
         |        $ds[$pos] = $ds[$pos - 1]; $ids[$pos] = $ids[$pos - 1]; $pos--;
         |      }
         |      $ds[$pos] = $s; $ids[$pos] = $c;
         |      if ($filled < $pp) $filled++;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |    java.util.Arrays.copyOf($ids, $filled));
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance computation over PQ codes: the per-query lookup
  * table `lut` (flattened [m][code]) holds ||q_sub − codebook||² per
  * sub-space; each row's approximate distance is M table lookups + sqrt. */
case class PqAdc(child: Expression, lut: Array[Double],
                 m: Int, codes: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on unexpected code arity

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs array<int> codes, got $other")
  }

  // null code → null result; checked only when the array type admits nulls
  private def mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m) return null
    if (mayHaveNullElems && PqGen.hasNullElem(a, m)) return null
    if (PqGen.hasBadCode(a, m, codes)) return null
    var sum = 0.0
    var mm = 0
    while (mm < m) {
      sum += lut(mm * codes + a.getInt(mm))
      mm += 1
    }
    math.sqrt(sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("pqLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val sum = ctx.freshName("sum"); val mm = ctx.freshName("m")
      s"""if ($a.numElements() != $m${PqGen.nullElemCheck(a, m, mayHaveNullElems)}${
             PqGen.codeRangeCheck(a, m, codes)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $mm = 0; $mm < $m; $mm++) {
         |    $sum += $t[$mm * $codes + $a.getInt($mm)];
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($sum);
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
