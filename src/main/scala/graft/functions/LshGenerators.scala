package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native LSH band-key generator: one row per (band, blocking-bucket)
  * emission. Replaces the `explode(flatten(transform(sequence(...),
  * named_struct(hash(slice(sig, ...)), ...))))` SQL-lambda chain, whose
  * interpreted evaluation allocates a sliced copy of the signature per
  * band and a struct per emission — the chain, not the hashing, dominated
  * dedup_ngram_jaccard's candidate pass.
  *
  * For each band b in [0, bands): the band digest folds the band's
  * `rowsPerBand` signature slots through splitmix; the row key mixes in
  * the blocking attributes (`lang` hashed, `bkt` as-is). Two rows per
  * band are emitted — (b, key(bkt)) and (b, key(bkt+1)) — the standard
  * neighbor-bucket blocking emission: any pair within one length bucket
  * of each other shares at least one key in every agreeing band.
  *
  * Key values are internal to the groupBy that consumes them (they never
  * meet SQL `hash()` output), so the digest only needs determinism and
  * dispersion, not compatibility.
  */
case class LshBandKeys(sig: Expression, lang: Expression, bkt: Expression,
                       bands: Int, rowsPerBand: Int)
    extends Generator with CodegenFallback {

  require(bands > 0 && rowsPerBand > 0,
    s"lsh_band_keys: bands=$bands and rowsPerBand=$rowsPerBand must be positive")

  override def children: Seq[Expression] = Seq(sig, lang, bkt)

  override def elementSchema: StructType = StructType(Seq(
    StructField("band_idx", IntegerType, nullable = false),
    StructField("band_key", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (sig.dataType, lang.dataType, bkt.dataType) match {
      case (ArrayType(LongType, _), StringType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys needs (array<long>, string, bigint), got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val sigV = sig.eval(input)
    val langV = lang.eval(input)
    val bktV = bkt.eval(input)
    if (sigV == null || langV == null || bktV == null) return Nil
    val arr = sigV.asInstanceOf[ArrayData]
    LshBandKeys.checkSig(arr, bands, rowsPerBand, "lsh_band_keys")
    val ls = langV.asInstanceOf[UTF8String]
    val langH = XXH64.hashUnsafeBytes(ls.getBaseObject, ls.getBaseOffset, ls.numBytes, 42L)
    val b0 = bktV.asInstanceOf[Long]
    val out = new Array[InternalRow](bands * 2)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rowsPerBand) {
        h = LshBandKeys.mix(h ^ LshBandKeys.slot(arr, b * rowsPerBand + r, "lsh_band_keys"))
        r += 1
      }
      h = LshBandKeys.mix(h ^ langH)
      out(2 * b) = InternalRow(b, LshBandKeys.mix(h ^ b0))
      out(2 * b + 1) = InternalRow(b, LshBandKeys.mix(h ^ (b0 + 1L)))
      b += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sig = newChildren(0), lang = newChildren(1), bkt = newChildren(2))
}

object LshBandKeys {
  @inline private[graft] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fail fast on a mis-sized signature: reading past it would otherwise
    * surface as an opaque AIOOBE (or, worse, silently wrong band keys for
    * a signature that is long enough physically but padded). */
  @inline private[functions] def checkSig(arr: ArrayData, bands: Int,
                                          rowsPerBand: Int, who: String): Unit = {
    val need = bands * rowsPerBand
    if (arr.numElements() < need)
      throw new IllegalArgumentException(
        s"$who: signature has ${arr.numElements()} slots, needs >= $need " +
          s"(bands=$bands x rowsPerBand=$rowsPerBand)")
  }

  /** A signature slot, rejecting NULL elements (ArrayType(containsNull)
    * is accepted by the type check; a null slot would silently read as 0
    * and band-key garbage). */
  @inline private[functions] def slot(arr: ArrayData, i: Int, who: String): Long = {
    if (arr.isNullAt(i))
      throw new IllegalArgumentException(s"$who: null signature slot at index $i")
    arr.getLong(i)
  }
}

/** Unblocked variant of [[LshBandKeys]]: one (band_idx, band_key) row per
  * band, no blocking attributes — the word-shingle MinHash-LSH path's
  * emission (its buckets are pure signature agreement). */
case class LshBands(sig: Expression, bands: Int, rowsPerBand: Int)
    extends Generator with CodegenFallback {

  require(bands > 0 && rowsPerBand > 0,
    s"lsh_bands: bands=$bands and rowsPerBand=$rowsPerBand must be positive")

  override def children: Seq[Expression] = Seq(sig)

  override def elementSchema: StructType = StructType(Seq(
    StructField("band_idx", IntegerType, nullable = false),
    StructField("band_key", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = sig.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"lsh_bands needs array<long>, got $dt")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val sigV = sig.eval(input)
    if (sigV == null) return Nil
    val arr = sigV.asInstanceOf[ArrayData]
    LshBandKeys.checkSig(arr, bands, rowsPerBand, "lsh_bands")
    val out = new Array[InternalRow](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rowsPerBand) {
        h = LshBandKeys.mix(h ^ LshBandKeys.slot(arr, b * rowsPerBand + r, "lsh_bands"))
        r += 1
      }
      out(b) = InternalRow(b, h)
      b += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sig = newChildren(0))
}

/** Native unordered-pair generator over a sorted id list: emits
  * (ids(i), ids(j)) for every i < j. Replaces the
  * `explode(flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2,
  * size(ids)), ...))))` chain, whose interpreted `slice` copies the tail
  * of the array once PER ELEMENT — O(k²) array copies per bucket on top
  * of the O(k²) pairs themselves. Lazy: a capped 2000-id bucket yields
  * its ~2M pairs without materializing them. */
case class SortedListPairs(ids: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(ids)

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = ids.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"sorted_list_pairs needs array<long>, got $dt")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = ids.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData].toLongArray()
    val n = arr.length
    if (n < 2) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val out = InternalRow(arr(i), arr(j))
        j += 1
        if (j == n) { i += 1; j = i + 1 }
        out
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ids = newChildren(0))
}

/** [[SortedListPairs]] restricted to pairs touching a BATCH member — the
  * streaming near-dedup candidate generator (r20): over a bucket's sorted
  * id list `all` and the subset `batch` that arrived this micro-batch,
  * emits (all(i), all(j)) for i < j where either side is in `batch`.
  * Replaces the batch-side semi-join + history join + pair normalization
  * (2 exchanges + 2 joins per micro-batch) with one grouped aggregation —
  * the same pair set: x∈batch × y∈all, x≠y, least/greatest-normalized,
  * history×history pairs excluded (they were discovered in the earlier
  * member's batch). Lazy like its parent; membership via binary search on
  * the sorted batch array. */
case class BatchListPairs(all: Expression, batch: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(all, batch)

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (all.dataType, batch.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"batch_list_pairs needs (array<long>, array<long>), got ($a, $b)")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val av = all.eval(input)
    val bv = batch.eval(input)
    if (av == null || bv == null) return Nil
    val arr = av.asInstanceOf[ArrayData].toLongArray()
    val bat = bv.asInstanceOf[ArrayData].toLongArray()
    val n = arr.length
    if (n < 2 || bat.length == 0) return Nil
    @inline def inBatch(x: Long): Boolean = java.util.Arrays.binarySearch(bat, x) >= 0
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var ready = false
      private def advance(): Unit = {
        while (!ready && i < n - 1) {
          // arr(i) != arr(j): the join formulation this replaces filtered
          // x =!= y BY VALUE — a doc_id listed twice in one bucket
          // (duplicate ids in a batch, or a replayed doc whose band key
          // already sits in history) must not emit a (d, d) self-pair,
          // which would trivially pass every exact verify
          if (arr(i) != arr(j) && (inBatch(arr(i)) || inBatch(arr(j)))) ready = true
          else { j += 1; if (j == n) { i += 1; j = i + 1 } }
        }
      }
      override def hasNext: Boolean = { advance(); ready && i < n - 1 }
      override def next(): InternalRow = {
        advance()
        val out = InternalRow(arr(i), arr(j))
        ready = false
        j += 1
        if (j == n) { i += 1; j = i + 1 }
        out
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(all = newChildren(0), batch = newChildren(1))
}
