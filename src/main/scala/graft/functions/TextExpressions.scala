package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin-Karp) over a document's bytes — the
  * document-fingerprint primitive for the LLM-pipeline text operators.
  * h = (h * 31 + byte) mod 1e9+7, full codegen. ASCII-safe (the oracle
  * mirrors it with per-char ascii codes).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"fingerprint needs string, got $dt")
  }

  private final val Mod = 1000000007L

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xffL)) % Mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("b"); val i = ctx.freshName("i"); val h = ctx.freshName("h")
      s"""byte[] $b = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * 31 + ($b[$i] & 0xffL)) % ${Mod}L;
         |}
         |${ev.value} = $h;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[functions] object HashUtil {
  /** xxHash64 of a UTF8String — same primitive Spark's xxhash64() uses. */
  @inline def xx(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}

/** 64-bit SimHash of a token array: each token hashed with xxHash64; each of
  * the 64 bit-positions accumulates +1/-1; sign gives the output bit.
  * Near-duplicate docs differ in few bits (hamming distance).
  */
case class SimHash64(child: Expression, seed: Long = 42L) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash needs array<string>, got $dt")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) { // null element = absent (getUTF8String NPEs)
        val h = HashUtil.xx(arr.getUTF8String(i), seed)
        var j = 0
        while (j < 64) { if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1; j += 1 }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      s"""int[] $acc = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |  long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $acc[$j]++; else $acc[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($acc[$j] > 0) $out |= (1L << $j); }
         |${ev.value} = $out;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature: numHashes permutation-minimums over a shingle set.
  * Permutation i is h_i(x) = (a_i * x + b_i) mod p (p = 2^61-1), with
  * a_i/b_i from a splitmix-style generator of `seed` — deterministic across
  * runs/partitions. Accepts array<string> (each element xxHash64'd first)
  * or array<long> (pre-hashed shingles, e.g. [[ShingleHashes]] output).
  * Returns array<long> of length numHashes.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash needs array<string|long>, got $dt")
  }

  private lazy val preHashed: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  private final val P = (1L << 61) - 1

  // splitmix64 step — stable param derivation
  private def mix(z0: Long): Long = LshBandKeys.mix(z0)

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => (mix(seed + 2L * i) & Long.MaxValue) % (P - 1) + 1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => (mix(seed + 2L * i + 1) & Long.MaxValue) % P)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) { i += 1 } else { // null element = absent
      val raw = if (preHashed) arr.getLong(i) else HashUtil.xx(arr.getUTF8String(i), seed)
      val x = raw & Long.MaxValue
      var j = 0
      while (j < numHashes) {
        // multiply mod p via Math.multiplyHigh-free 128-bit-safe route:
        // values < 2^61, use BigInt-free mulmod with Math.multiplyHigh
        val m = mulMod(as(j), x % P) + bs(j)
        val hv = if (m >= P) m - P else m
        if (hv < mins(j)) mins(j) = hv
        j += 1
      }
      i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** (a*b) mod p for p = 2^61-1 using 128-bit product via multiplyHigh.
    * After the fold, `l61 + rest` can reach ~2P+8, so reduce in a loop —
    * a single conditional subtract can leave a value >= P.
    */
  @inline private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod p
    val l61 = lo & P
    val rest = (hi << 3) | (lo >>> 61)
    var r = l61 + rest
    while (r >= P) r -= P
    r
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document term frequencies in ONE row-local pass: array<string> →
  * array<struct<term string, tf bigint>>, first-occurrence term order.
  * TF is a function of the row alone, so computing it here removes the
  * corpus-wide (doc_id, term) exchange the `groupBy(doc_id, dl, term)`
  * formulation paid before every postings write / BM25 scan (r20, guide
  * §2.4: remove shuffles outright — at 100 TB that exchange carried every
  * token of the corpus into a hash aggregate whose answer each row
  * already knew). Null elements are absent, as in [[SimHash64]].
  */
case class TermCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"term_counts needs array<string>, got $dt")
  }

  override def nullSafeEval(v: Any): Any =
    TermCountsUtil.count(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TermCountsUtil.count($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCountsUtil {
  /** Shared by interpreted eval and generated code: one LinkedHashMap
    * pass; UTF8String keys are cloned (they may view reused buffers). */
  def count(arr: ArrayData): ArrayData = {
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).clone()
        counts.put(t, counts.getOrDefault(t, 0L) + 1L)
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
}
