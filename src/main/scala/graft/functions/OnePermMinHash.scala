package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-permutation MinHash (Li, Owen, Zhang 2012) with OPTIMAL
  * densification (Shrivastava 2017): hashes every set element ONCE,
  * routes it to one of `numSlots` slots by its residue, and keeps the
  * per-slot minimum; each empty slot borrows from a filled donor slot
  * chosen by an independent pseudorandom probe sequence keyed on the
  * empty slot's index (see `densify`). The probe INDEPENDENCE per empty
  * slot is what matters on sparse sets: rotation densification
  * (Shrivastava & Li 2014) makes runs of empty slots copy the SAME donor,
  * collapsing r-row bands into single-slot tests — measured here as
  * 27,154 spurious candidate pairs vs 256 on the word-shingle corpus —
  * so the densification choice is a correctness-of-scale matter, not a
  * constant. Slot-match probability stays ≈ Jaccard — the same LSH
  * banding guarantees as [[MinHashSignature]] — at 1/numSlots of the hash
  * work: the k-hash signature pays k modular multiplies per element,
  * this pays one mix.
  *
  * Input: array<long> (pre-hashed shingles, e.g. [[NgramHashes]] output),
  * array<string> (each element xxHash64'd first), or — when `gramLen > 0`
  * — a raw string, in which case the char-`gramLen`-gram multiset is
  * hashed inline with the EXACT hash values [[NgramHashes]] produces, but
  * with no array materialization, sort, or dedupe (the slot minimum is
  * duplicate- and order-insensitive, so the signature equals OPH over the
  * distinct gram set). Output: array<long> of length numSlots.
  * Deterministic across runs and partitions.
  */
case class OnePermMinHash(child: Expression, numSlots: Int, seed: Long = 42L,
                          gramLen: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, gramLen) match {
    case (ArrayType(StringType | LongType, _), 0) if numSlots > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case (StringType, g) if g > 0 && numSlots > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case (dt, g) => TypeCheckResult.TypeCheckFailure(
      s"one_perm_minhash needs array<string|long> (gramLen=0) or string (gramLen>0), got $dt / gramLen=$g")
  }

  private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    if (gramLen > 0)
      OnePermMinHash.computeGrams(v.asInstanceOf[UTF8String], gramLen, numSlots, seed)
    else
      OnePermMinHash.compute(v.asInstanceOf[ArrayData], numSlots, seed, preHashed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      if (gramLen > 0)
        s"${ev.value} = graft.functions.OnePermMinHash.computeGrams($in, $gramLen, $numSlots, ${seed}L);"
      else
        s"${ev.value} = graft.functions.OnePermMinHash.compute($in, $numSlots, ${seed}L, $preHashed);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OnePermMinHash {
  /** Probe-sequence stride for the donor search in `densify`: a large odd
    * constant mixed with the empty slot's index and the attempt number so
    * every empty slot walks its own pseudorandom donor sequence. */
  private final val C = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — decorrelates the slot/value split from the
    * element hash. Delegates to the package's ONE definition
    * ([[LshBandKeys.mix]]): band keys and OPH slots share the same
    * dispersion primitive by construction. */
  @inline private def mix(z0: Long): Long = LshBandKeys.mix(z0)

  @inline private def update(mins: Array[Long], filled: Array[Boolean],
                             numSlots: Int, seed: Long, raw: Long): Unit = {
    val h = mix(raw ^ seed)
    // route by the full unsigned hash, rank by the same hash — after the
    // finalizer the residue and the order statistics are independent
    // enough for slot-match probability ≈ Jaccard (checked against the
    // k-hash signature in the spec suite)
    val slot = java.lang.Long.remainderUnsigned(h, numSlots.toLong).toInt
    if (h < mins(slot)) mins(slot) = h
    filled(slot) = true
  }

  /** OPTIMAL densification (Shrivastava 2017): each empty slot j probes a
    * pseudorandom donor sequence h(j, 1), h(j, 2), … until a filled slot
    * is found and borrows ITS minimum. Probe sequences are per-slot
    * independent, so adjacent empty slots borrow from different donors —
    * unlike rotation densification, where a run of empty slots copies ONE
    * donor and an r-row LSH band degenerates to a single-slot test
    * (measured: 27,154 candidate pairs vs the k-hash signature's 256 on
    * the sparse word-shingle corpus — shingle sets of ~52 elements leave
    * most of 128 slots empty). With hashed borrowing, slot-match
    * probability stays ≈ J per slot AND ≈ independent across a band's
    * rows. Deterministic: the probe sequence depends only on (j, attempt).
    * An all-empty input keeps Long.MaxValue everywhere — callers filter
    * empty sets upstream. */
  private def densify(mins: Array[Long], filled: Array[Boolean], numSlots: Int): ArrayData = {
    var j = 0
    while (j < numSlots) {
      if (!filled(j)) {
        var attempt = 1
        var done = false
        // expected probes = numSlots/|filled|; the cap only guards the
        // near-empty pathological case before the deterministic fallback
        while (!done && attempt <= 4 * numSlots) {
          val d = java.lang.Long.remainderUnsigned(
            mix(j.toLong * 0x100000001b3L + attempt.toLong * C), numSlots.toLong).toInt
          if (filled(d)) { mins(j) = mins(d); done = true }
          attempt += 1
        }
        if (!done) {
          // fallback: first filled slot by index (still deterministic)
          var k = 0
          while (k < numSlots && !done) {
            if (filled(k)) { mins(j) = mins(k); done = true }
            k += 1
          }
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Static kernel over a pre-tokenized set (callable from generated code). */
  def compute(arr: ArrayData, numSlots: Int, seed: Long, preHashed: Boolean): ArrayData = {
    val mins = new Array[Long](numSlots)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val filled = new Array[Boolean](numSlots)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null elements are SKIPPED, not hashed: getUTF8String would NPE
      // and getLong silently reads 0 — a user-supplied array<...> with a
      // null member means "element absent", same as an empty slot
      if (!arr.isNullAt(i)) {
        val raw =
          if (preHashed) arr.getLong(i)
          else {
            val s = arr.getUTF8String(i)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
          }
        update(mins, filled, numSlots, seed, raw)
      }
      i += 1
    }
    densify(mins, filled, numSlots)
  }

  /** Fused string kernel: char-n-gram hashes (bit-identical to
    * [[NgramHashes]] — same windows, same seed) streamed straight into the
    * slot minima. One xxhash + one mix per character position; nothing
    * materialized. */
  def computeGrams(s: UTF8String, n: Int, numSlots: Int, seed: Long): ArrayData = {
    val mins = new Array[Long](numSlots)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val filled = new Array[Boolean](numSlots)
    val numChars = s.numChars()
    val cnt = numChars - n + 1
    if (cnt > 0) {
      if (s.numBytes() == numChars) {
        // ASCII fast path: char windows == byte windows
        val base = s.getBaseObject
        val off = s.getBaseOffset
        var i = 0
        while (i < cnt) {
          update(mins, filled, numSlots, seed,
            XXH64.hashUnsafeBytes(base, off + i, n, seed))
          i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val sub = s.substring(i, i + n)
          update(mins, filled, numSlots, seed,
            XXH64.hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset, sub.numBytes, seed))
          i += 1
        }
      }
    }
    densify(mins, filled, numSlots)
  }
}
