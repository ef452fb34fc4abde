package graft

import graft.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.typedLit
import org.apache.spark.sql.types._

/** Unit tests for the native Catalyst expressions: interpreted eval must
  * equal the codegen'd DataFrame result, and both must match hand-computed
  * reference values (a Janino error or eval/codegen divergence fails here
  * instead of shipping). */
class ExpressionSpec extends SparkSpec {

  /** Evaluate a Column through the normal (codegen) path. */
  private def viaDf(c: Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  private def fLit(xs: Float*): Literal =
    Literal.create(xs, ArrayType(FloatType))

  test("vector_distance dot/l2/cosine known values, interpreted == codegen") {
    val a = fLit(1f, 2f); val b = fLit(3f, 4f)
    val dotI = VectorDistance(a, b, "dot").eval(null).asInstanceOf[Double]
    assert(dotI === 11.0)
    val l2I = VectorDistance(a, b, "l2").eval(null).asInstanceOf[Double]
    assert(math.abs(l2I - math.sqrt(8.0)) < 1e-12)
    val cosI = VectorDistance(a, b, "cosine").eval(null).asInstanceOf[Double]
    assert(math.abs(cosI - 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))) < 1e-12)

    val av = typedLit(Seq(1f, 2f)); val bv = typedLit(Seq(3f, 4f))
    assert(viaDf(vec_dot(av, bv)) === dotI)
    assert(viaDf(vec_l2(av, bv)) === l2I)
    assert(viaDf(vec_cosine(av, bv)) === cosI)
  }

  test("vector_distance over array<double> and mixed float/double operands") {
    val dLit = Literal.create(Seq(1.0 / 3.0, 2.0 / 3.0), ArrayType(DoubleType))
    val dot = VectorDistance(dLit, dLit, "dot").eval(null).asInstanceOf[Double]
    assert(math.abs(dot - (1.0 / 9.0 + 4.0 / 9.0)) < 1e-15)
    // mixed: float side is widened per element, matching an explicit cast
    val f = fLit(1.5f, 2.5f)
    val mixed = VectorDistance(f, dLit, "dot").eval(null).asInstanceOf[Double]
    assert(math.abs(mixed - (1.5 / 3.0 + 2.5 * 2.0 / 3.0)) < 1e-15)
    val dv = typedLit(Seq(1.0 / 3.0, 2.0 / 3.0))
    assert(viaDf(vec_dot(dv, dv)) === dot)
    assert(viaDf(vec_dot(typedLit(Seq(1.5f, 2.5f)), dv)) === mixed)
    // pq_encode accepts double vectors
    val codebooks = Array(0.0, 0.0, 3.0, 3.0) // m=1, codes=2, subDim=2
    val enc = PqEncode(dLit, codebooks, 1, 2, 2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(enc.getInt(0) === 0) // (1/3,2/3) is closer to (0,0) than (3,3)
  }

  test("vector_distance returns null on dimension mismatch, both paths") {
    val a = fLit(1f, 2f); val b = fLit(1f, 2f, 3f)
    assert(VectorDistance(a, b, "dot").eval(null) == null)
    assert(viaDf(vec_dot(typedLit(Seq(1f, 2f)), typedLit(Seq(1f, 2f, 3f)))) == null)
  }

  test("pq_encode/pq_adc known values, interpreted == codegen") {
    // 2 subspaces × 2 codes × 2 dims: codebooks [m][c][d]
    // m=0: c0=(0,0) c1=(10,10); m=1: c0=(5,5) c1=(-5,-5)
    val flat = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0, -5.0, -5.0)
    val v = fLit(9f, 9f, 4f, 4f) // sub0 → c1, sub1 → c0
    val encI = PqEncode(v, flat, 2, 2, 2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    assert(encI.toSeq === Seq(1, 0))
    val encC = viaDf(pq_encode(typedLit(Seq(9f, 9f, 4f, 4f)), flat, 2, 2, 2))
      .asInstanceOf[scala.collection.Seq[Int]]
    assert(encC.toSeq === Seq(1, 0))
    // ADC with lut[m*codes+c]: query (9,9,4,4) → d((9,9),c1)²=2, d((4,4),c0)²=2
    val lut = Array(162.0, 2.0, 2.0, 162.0)
    val codesLit = Literal.create(Seq(1, 0), ArrayType(IntegerType))
    val adcI = PqAdc(codesLit, lut, 2, 2).eval(null).asInstanceOf[Double]
    assert(math.abs(adcI - 2.0) < 1e-12)
    assert(viaDf(pq_adc(typedLit(Seq(1, 0)), lut, 2, 2)) === adcI)
    // dimension mismatch → null, both paths
    assert(PqEncode(fLit(1f, 2f), flat, 2, 2, 2).eval(null) == null)
    assert(viaDf(pq_adc(typedLit(Seq(1, 0, 1)), lut, 2, 2)) == null)
  }

  test("nearest_cell known values, float + double, interpreted == codegen") {
    // 3 cells × 2 dims: c0=(0,0) c1=(10,10) c2=(5,5)
    val flat = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0)
    val v = fLit(6f, 6f) // nearest is c2
    assert(NearestCell(v, flat, 3, 2).eval(null) === 2)
    assert(viaDf(nearest_cell(typedLit(Seq(6f, 6f)), flat, 3, 2)) === 2)
    // double vectors pass through without a cast
    val dv = Literal.create(Seq(9.0, 9.5), ArrayType(DoubleType))
    assert(NearestCell(dv, flat, 3, 2).eval(null) === 1)
    assert(viaDf(nearest_cell(typedLit(Seq(9.0, 9.5)), flat, 3, 2)) === 1)
    // ties break to the first index (equidistant from c0 and c1)
    assert(NearestCell(fLit(5f, 5f), Array(0.0, 0.0, 10.0, 10.0), 2, 2)
      .eval(null) === 0)
    // dimension mismatch → null, both paths
    assert(NearestCell(fLit(1f), flat, 3, 2).eval(null) == null)
    assert(viaDf(nearest_cell(typedLit(Seq(1f)), flat, 3, 2)) == null)
  }

  test("nearest_cells top-p ordering, truncation, interpreted == codegen") {
    // 4 cells on a line: c0=0, c1=10, c2=5, c3=2 (1-D)
    val flat = Array(0.0, 10.0, 5.0, 2.0)
    val v = fLit(1f) // distances: c0=1, c1=81, c2=16, c3=1 → order c0, c3, c2, c1
    def ids(x: Any): Seq[Int] =
      x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
    assert(ids(NearestCells(v, flat, 4, 1, 3).eval(null)) === Seq(0, 3, 2))
    assert(viaDf(nearest_cells(typedLit(Seq(1f)), flat, 4, 1, 3))
      .asInstanceOf[scala.collection.Seq[Int]].toSeq === Seq(0, 3, 2))
    // ties break to the lower cell id (c0 and c3 both at distance 1)
    assert(ids(NearestCells(v, flat, 4, 1, 2).eval(null)) === Seq(0, 3))
    // p > cells truncates to cells
    assert(ids(NearestCells(v, flat, 4, 1, 9).eval(null)) === Seq(0, 3, 2, 1))
    // dim mismatch → null, both paths
    assert(NearestCells(fLit(1f, 2f), flat, 4, 1, 2).eval(null) == null)
    assert(viaDf(nearest_cells(typedLit(Seq(1f, 2f)), flat, 4, 1, 2)) == null)
  }

  test("pq_adc_pair reconstructs the ADC distance per pair, interpreted == codegen") {
    // same codebooks as the pq_encode/pq_adc test: m=2, codes=2, subDim=2
    val flat = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0, -5.0, -5.0)
    val codes = Literal.create(Seq(1, 0), ArrayType(IntegerType))
    val q = fLit(9f, 9f, 4f, 4f) // d²((9,9),c1)=2, d²((4,4),c0)=2 → sqrt(4)=2
    val i = PqAdcPair(codes, q, flat, 2, 2, 2).eval(null).asInstanceOf[Double]
    assert(math.abs(i - 2.0) < 1e-12)
    assert(viaDf(pq_adc_pair(typedLit(Seq(1, 0)), typedLit(Seq(9f, 9f, 4f, 4f)),
      flat, 2, 2, 2)) === i)
    // double query vectors pass through without a cast
    val qd = Literal.create(Seq(9.0, 9.0, 4.0, 4.0), ArrayType(DoubleType))
    assert(math.abs(PqAdcPair(codes, qd, flat, 2, 2, 2).eval(null)
      .asInstanceOf[Double] - 2.0) < 1e-12)
    // code/dim arity mismatch → null, both paths
    assert(PqAdcPair(Literal.create(Seq(1), ArrayType(IntegerType)), q,
      flat, 2, 2, 2).eval(null) == null)
    assert(viaDf(pq_adc_pair(typedLit(Seq(1, 0)), typedLit(Seq(9f, 9f)),
      flat, 2, 2, 2)) == null)
  }

  test("null array ELEMENTS null the result across the PQ expressions (no silent 0.0)") {
    def fLitN(xs: Option[Float]*): Literal =
      Literal.create(xs.map(_.map(Float.box).orNull),
        ArrayType(FloatType, containsNull = true))
    val flat3 = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0) // 3 cells × 2 dims
    val vN = fLitN(Some(6f), None)
    assert(NearestCell(vN, flat3, 3, 2).eval(null) == null)
    assert(NearestCells(vN, flat3, 3, 2, 2).eval(null) == null)
    val cb = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0, -5.0, -5.0) // m=2,codes=2,subDim=2
    assert(PqEncode(fLitN(Some(9f), None, Some(4f), Some(4f)), cb, 2, 2, 2)
      .eval(null) == null)
    val codesN = Literal.create(Seq[Any](1, null),
      ArrayType(IntegerType, containsNull = true))
    assert(PqAdc(codesN, Array(0.0, 1.0, 2.0, 3.0), 2, 2).eval(null) == null)
    assert(PqAdcPair(codesN, fLit(9f, 9f, 4f, 4f), cb, 2, 2, 2).eval(null) == null)
    assert(PqAdcPair(Literal.create(Seq(1, 0), ArrayType(IntegerType)),
      fLitN(Some(9f), None, Some(4f), Some(4f)), cb, 2, 2, 2).eval(null) == null)
    // codegen path agrees (typedLit of Option keeps containsNull=true)
    assert(viaDf(nearest_cell(typedLit(Seq(Some(6f), None)), flat3, 3, 2)) == null)
    assert(viaDf(nearest_cells(typedLit(Seq(Some(6f), None)), flat3, 3, 2, 2)) == null)
    assert(viaDf(pq_encode(typedLit(Seq(Some(9f), None, Some(4f), Some(4f))),
      cb, 2, 2, 2)) == null)
    assert(viaDf(pq_adc_pair(typedLit(Seq(Some(1), None)),
      typedLit(Seq(9f, 9f, 4f, 4f)), cb, 2, 2, 2)) == null)
    // ... while an all-present nullable array still computes normally
    assert(viaDf(nearest_cell(typedLit(Seq(Some(6f), Some(6f))), flat3, 3, 2)) === 2)
  }

  test("out-of-range PQ codes null the ADC result, never index past the codebook") {
    // pq_adc / pq_adc_pair are public over arbitrary array<int> columns: a
    // code outside [0, codes) must degrade to null like every other
    // malformed-input case — not AIOOBE, not a neighboring subspace's
    // codebook entry (r10 review)
    val cb = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0, -5.0, -5.0) // m=2,codes=2,subDim=2
    val lut = Array(162.0, 2.0, 2.0, 162.0)
    for (bad <- Seq(Seq(300, 0), Seq(-1, 0), Seq(1, 2))) {
      val lit = Literal.create(bad, ArrayType(IntegerType))
      assert(PqAdc(lit, lut, 2, 2).eval(null) == null, s"pq_adc $bad")
      assert(PqAdcPair(lit, fLit(9f, 9f, 4f, 4f), cb, 2, 2, 2).eval(null) == null,
        s"pq_adc_pair $bad")
      assert(viaDf(pq_adc(typedLit(bad), lut, 2, 2)) == null, s"codegen pq_adc $bad")
      assert(viaDf(pq_adc_pair(typedLit(bad), typedLit(Seq(9f, 9f, 4f, 4f)),
        cb, 2, 2, 2)) == null, s"codegen pq_adc_pair $bad")
    }
    // boundary codes still compute
    assert(viaDf(pq_adc(typedLit(Seq(1, 0)), lut, 2, 2)) === 2.0)
  }

  test("rolling fingerprint known value ('Hi' -> 2337), interpreted == codegen") {
    // h = ((0*31+72)%p)*31 + 105 = 2337 — mirrored by the DuckDB oracle
    val i = RollingFingerprint(Literal("Hi")).eval(null)
    assert(i === 2337L)
    assert(viaDf(fingerprint(typedLit("Hi"))) === 2337L)
  }

  test("bit_pack_sign packs MSB-first words; hamming_dist == sign-mismatch count") {
    // 3 elements: +,-,+ → bits 101 in the low bits of one word
    val v = fLit(1.5f, -2f, 0.25f)
    val packed = BitPackSign(v).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(packed.numElements() === 1)
    assert(packed.getLong(0) === 5L) // 0b101
    // 64-element vector fills exactly one word; alternating signs
    val alt = (0 until 64).map(i => if (i % 2 == 0) 1f else -1f)
    val w = BitPackSign(Literal.create(alt, ArrayType(FloatType))).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(w.numElements() === 1)
    assert(w.getLong(0) === java.lang.Long.parseUnsignedLong(
      "1010101010101010101010101010101010101010101010101010101010101010", 2))
    // 65 elements spill into a second word with the tail in the low bit
    val w65 = BitPackSign(Literal.create(alt :+ 1f, ArrayType(FloatType))).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(w65.numElements() === 2)
    assert(w65.getLong(1) === 1L)
    // codegen == interpreted
    assert(viaDf(bit_pack_sign(typedLit(Seq(1.5f, -2f, 0.25f))))
      .asInstanceOf[scala.collection.Seq[Long]] === Seq(5L))

    // hamming over packed words == direct sign-mismatch count, and the
    // native path agrees with the builtin zip_with formulation
    val rnd = new scala.util.Random(42)
    val a = Seq.fill(64)(rnd.nextFloat() - 0.5f)
    val b = Seq.fill(64)(rnd.nextFloat() - 0.5f)
    val expected = a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }
    val hI = HammingDistance(
      BitPackSign(Literal.create(a, ArrayType(FloatType))),
      BitPackSign(Literal.create(b, ArrayType(FloatType)))).eval(null)
    assert(hI === expected.toLong)
    assert(viaDf(hamming_dist(bit_pack_sign(typedLit(a)), bit_pack_sign(typedLit(b))))
      === expected.toLong)
    import org.apache.spark.sql.functions._
    val builtin = viaDf(aggregate(
      zip_with(typedLit(a), typedLit(b),
        (x, y) => when((x > 0f) =!= (y > 0f), 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x))
    assert(builtin === expected.toLong)
    // word-count mismatch → null (never a truncated distance)
    assert(HammingDistance(
      BitPackSign(fLit(1f)), BitPackSign(Literal.create(alt :+ 1f, ArrayType(FloatType))))
      .eval(null) == null)
  }

  test("simhash deterministic, interpreted == codegen, near-dup property") {
    val toks = Seq("spark", "scan", "row", "agg", "filter", "join", "merge")
    val lit = Literal.create(toks, ArrayType(StringType))
    val interp = SimHash64(lit).eval(null).asInstanceOf[Long]
    assert(viaDf(simhash(typedLit(toks))) === interp)
    // one replaced token should move few of the 64 bits
    val toks2 = toks.updated(2, "line")
    val h2 = SimHash64(Literal.create(toks2, ArrayType(StringType))).eval(null)
      .asInstanceOf[Long]
    assert(java.lang.Long.bitCount(interp ^ h2) < 32)
    // different seed → different hash
    val seeded = SimHash64(lit, seed = 7L).eval(null).asInstanceOf[Long]
    assert(seeded !== interp)
  }

  test("minhash signature: length, determinism, containment property") {
    val xs = Seq("a b c", "b c d", "c d e", "d e f")
    val lit = Literal.create(xs, ArrayType(StringType))
    val sig1 = MinHashSignature(lit, 128).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(sig1.length === 128)
    val sig1b = MinHashSignature(lit, 128).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(sig1.sameElements(sig1b))
    assert(viaDf(minhash(typedLit(xs), 128))
      .asInstanceOf[scala.collection.Seq[Long]].toArray.sameElements(sig1))
    // identical sets → identical signatures; a superset keeps each min <=
    val sig2 = MinHashSignature(
      Literal.create(xs :+ "e f g", ArrayType(StringType)), 128).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(sig1.zip(sig2).forall { case (m1, m2) => m2 <= m1 })
    // all signature values < 2^61-1 (mulMod reduction is complete)
    assert(sig1.forall(v => v >= 0 && v < (1L << 61) - 1))
  }

  test("sorted_jaccard merge walk == set-op jaccard, interpreted == codegen") {
    val a = Seq(1L, 3L, 5L, 9L); val b = Seq(3L, 5L, 7L)
    // |∩|=2, |∪|=5
    val i = SortedJaccard(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType))).eval(null)
    assert(i === 0.4)
    assert(viaDf(sorted_jaccard(typedLit(a), typedLit(b))) === 0.4)
    assert(viaDf(sorted_jaccard(typedLit(Seq.empty[Long]), typedLit(Seq.empty[Long]))) === 0.0)
  }

  test("one_perm_minhash: fused string kernel == array kernel; dup/order-insensitive; densified") {
    import org.apache.spark.sql.functions.{col, lit}
    val text = "the quick brown fox jumps over the lazy dog"
    // fused text->signature equals OPH over the (sorted-distinct) ngram_hashes set
    val row = spark.range(1)
      .select(ngram_oph(lit(text), 3, 64).as("fused"),
        one_perm_minhash(ngram_hashes(lit(text), 3), 64).as("fromSet"))
      .collect()(0)
    assert(row.getSeq[Long](0) === row.getSeq[Long](1))
    // duplicate & order insensitivity of the set kernel (slot minima)
    val a = Seq(7L, 3L, 11L, 3L, 7L)
    val b = Seq(3L, 7L, 11L)
    val r2 = spark.range(1)
      .select(one_perm_minhash(typedLit(a), 32).as("x"),
        one_perm_minhash(typedLit(b), 32).as("y")).collect()(0)
    assert(r2.getSeq[Long](0) === r2.getSeq[Long](1))
    // densification: 3 elements into 32 slots still yields a fully-filled,
    // deterministic signature (no Long.MaxValue leftovers)
    assert(r2.getSeq[Long](0).length === 32)
    assert(!r2.getSeq[Long](0).contains(Long.MaxValue))
    // slot-match fraction approximates Jaccard: identical sets match all
    // slots; disjoint-ish sets match almost none
    val c1 = Seq.tabulate(200)(i => i * 2654435761L)
    val c2 = Seq.tabulate(200)(i => (i + 500) * 2654435761L)
    val r3 = spark.range(1)
      .select(one_perm_minhash(typedLit(c1), 64).as("x"),
        one_perm_minhash(typedLit(c2), 64).as("y")).collect()(0)
    val matches = r3.getSeq[Long](0).zip(r3.getSeq[Long](1)).count { case (x, y) => x == y }
    assert(matches <= 8, s"disjoint sets should rarely share slot minima, got $matches/64")
    // null array elements mean "absent", not NPE (string) or silent 0
    // (long): the signature of [x, NULL, y] equals the signature of [x, y]
    val withNull = spark.range(1)
      .select(
        one_perm_minhash(typedLit(Seq("a", null, "b")), 16).as("g"),
        one_perm_minhash(typedLit(Seq("a", "b")), 16).as("h"),
        simhash(typedLit(Seq("a", null, "b"))).as("s1"),
        simhash(typedLit(Seq("a", "b"))).as("s2"))
      .collect()(0)
    assert(withNull.getSeq[Long](0) === withNull.getSeq[Long](1))
    assert(withNull.getLong(2) === withNull.getLong(3))
  }

  test("GraftExtensions exposes the same builders as session registration") {
    val names = graft.functions.sqlFunctions.map(_._1)
    assert(names === Seq("vec_dot", "vec_l2", "vec_cosine", "bit_pack_sign",
      "hamming_dist", "graft_fingerprint", "graft_simhash", "graft_minhash",
      "one_perm_minhash", "ngram_oph", "hll_sketch", "hll_merge",
      "hll_estimate", "sorted_jaccard", "ngram_hashes", "shingle_hashes",
      "deflate_len", "bpe_stats", "bpe_chunks"))
    // builders produce evaluable expressions (the extension injects these)
    val dot = graft.functions.sqlFunctions.toMap.apply("vec_dot")(
      Seq(fLit(1f, 2f), fLit(3f, 4f)))
    assert(dot.eval(null) === 11.0)
    // applying the extension must not throw and must register every name
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("deflate_len: matches an independent Deflater, interpreted == codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // independent reference: a FRESH Deflater per call (the expression uses
    // a thread-local reused stream — reset() must make them agree)
    def ref(bytes: Array[Byte]): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val repetitive = "spam " * 400                       // deflates hard
    val natural = "The quick brown fox jumps over the lazy dog. " * 40
    val unicode = "汉字テキスト αβγ émojis 🚀 mixed in " * 30
    for (s <- Seq("", "x", repetitive, natural, unicode)) {
      val expect = ref(s.getBytes("UTF-8"))
      assert(DeflateLen(Literal(s)).eval(null) === expect, s"interpreted '$s'")
      assert(viaDf(deflate_len(typedLit(s))) === expect, s"codegen '$s'")
    }
    // ratio sanity: repetition compresses far below natural prose
    val rRep = ref(repetitive.getBytes("UTF-8")).toDouble / repetitive.getBytes("UTF-8").length
    val rNat = ref(natural.getBytes("UTF-8")).toDouble / natural.getBytes("UTF-8").length
    assert(rRep < rNat)
    assert(rRep < 0.05)
    // binary input: random bytes are incompressible (ratio ~1, stored blocks)
    val rnd = new java.util.Random(42)
    val noise = new Array[Byte](4096); rnd.nextBytes(noise)
    val nLen = ref(noise)
    assert(viaDf(deflate_len(typedLit(noise))) === nLen)
    assert(nLen.toDouble / noise.length > 0.95)
    // null in, null out
    assert(viaDf(deflate_len(org.apache.spark.sql.functions.lit(null).cast("string"))) == null)
  }

  test("graft functions registered for SQL") {
    registerAll(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_fingerprint('Hi') AS f, " +
        "graft_simhash(array('a','b'), 7L) AS s, " +
        "size(graft_minhash(array('a','b'), 16)) AS m").collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 2337L)
    assert(r.getInt(3) === 16)
  }

  test("lsh band generators fail fast on mis-sized signatures and null slots") {
    import org.apache.spark.sql.functions._
    import graft.functions.{lsh_bands, lsh_band_keys}
    // well-sized: 4 bands x 2 rows over 8 slots works
    val ok = spark.range(1)
      .select(lsh_bands(sequence(lit(1L), lit(8L)), 4, 2))
      .collect()
    assert(ok.length === 4)
    // mis-sized: 8 slots cannot serve 5 bands x 2 rows — a diagnosis, not
    // an opaque ArrayIndexOutOfBounds (or a silent 0-read on some layouts)
    val eShort = intercept[org.apache.spark.SparkException] {
      spark.range(1)
        .select(lsh_bands(sequence(lit(1L), lit(8L)), 5, 2)).collect()
    }
    assert(eShort.getCause.getMessage.contains("needs >= 10"), eShort.getCause.getMessage)
    // null slot: containsNull arrays are type-accepted, so the read must
    // reject the null rather than band-key a silent 0
    val eNull = intercept[org.apache.spark.SparkException] {
      spark.range(1)
        .select(lsh_band_keys(array(lit(1L), lit(null).cast("long")),
          lit("en"), lit(0L), 1, 2)).collect()
    }
    assert(eNull.getCause.getMessage.contains("null signature slot"),
      eNull.getCause.getMessage)
    // degenerate construction rejected outright
    intercept[IllegalArgumentException] {
      lsh_bands(sequence(lit(1L), lit(8L)), 0, 2)
    }
  }

  test("term_counts == the groupBy TF it replaced, interpreted == codegen") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic synthetic docs incl. repeats, empties and a null token
    val docs = Seq(
      (1L, Seq("a", "b", "a", "c", "a")),
      (2L, Seq("b")),
      (3L, Seq.empty[String]),
      (4L, Seq("z", "z", "z", "z"))
    ).toDF("doc_id", "w")
    val viaExpr = docs
      .select(col("doc_id"), explode(term_counts(col("w"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaGroup = docs
      .select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaExpr === viaGroup)
    // first-occurrence order + interpreted == codegen on one value
    val arr = Literal.create(Seq("x", "y", "x"), ArrayType(StringType))
    val interp = TermCounts(arr).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.numElements() === 2)
    val r0 = interp.getStruct(0, 2); val r1 = interp.getStruct(1, 2)
    assert(r0.getUTF8String(0).toString === "x" && r0.getLong(1) === 2L)
    assert(r1.getUTF8String(0).toString === "y" && r1.getLong(1) === 1L)
    val viaCg = spark.range(1)
      .select(explode(term_counts(typedLit(Seq("x", "y", "x")))).as("tc"))
      .select(col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaCg === Seq(("x", 2L), ("y", 1L)))
  }


  test("batch_list_pairs == the join-shaped candidate set it replaced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // synthetic buckets: (bucket, id, isBatch); compare the generator
    // against the former semi-join + history-join formulation
    val rows = Seq(
      (0, 1L, true), (0, 2L, false), (0, 3L, false), (0, 9L, true),
      (1, 4L, false), (1, 5L, false),                       // history-only: no pairs
      (2, 6L, true), (2, 7L, true),                         // batch-batch pair
      (3, 8L, true)                                         // singleton
    ).toDF("bkt", "doc_id", "f")
    val viaGen = rows.groupBy("bkt")
      .agg(capped_sorted_list(col("doc_id"), 100).as("all_ids"),
        capped_sorted_list(when(col("f"), col("doc_id")), 100).as("batch_ids"))
      .filter(col("all_ids").isNotNull && size(col("all_ids")) >= 2 &&
        size(col("batch_ids")) >= 1)
      .select(batch_list_pairs(col("all_ids"), col("batch_ids")))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bk = rows.filter(col("f"))
    val viaJoin = bk.select(col("bkt"), col("doc_id").as("x"))
      .join(rows.select(col("bkt"), col("doc_id").as("y")), Seq("bkt"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaGen === viaJoin)
    assert(viaGen.contains((6L, 7L)) && !viaGen.contains((4L, 5L)))
    // cap drop: bucket over cap NULLs out entirely (the count-filter posture)
    val over = rows.groupBy("bkt")
      .agg(capped_sorted_list(col("doc_id"), 1).as("all_ids"),
        capped_sorted_list(when(col("f"), col("doc_id")), 1).as("batch_ids"))
      .filter(col("all_ids").isNotNull)
      .collect().map(_.getInt(0)).toSet
    assert(over === Set(3)) // only the singleton bucket survives cap=1
  }

  test("batch_list_pairs: duplicate doc_ids in a bucket never emit self-pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // id 1 appears in the batch AND in history (a re-delivered doc whose
    // band key already sits in the keys table), id 2 twice in one batch —
    // the join formulation filtered x =!= y BY VALUE, so the generator
    // must skip equal-value positions, not just equal positions (a (d,d)
    // self-pair trivially passes every exact verify)
    val rows = Seq(
      (0, 1L, true), (0, 1L, false), (0, 3L, false),
      (1, 2L, true), (1, 2L, true),
      (2, 5L, true), (2, 5L, false), (2, 5L, false) // only-duplicates bucket
    ).toDF("bkt", "doc_id", "f")
    val viaGen = rows.groupBy("bkt")
      .agg(capped_sorted_list(col("doc_id"), 100).as("all_ids"),
        capped_sorted_list(when(col("f"), col("doc_id")), 100).as("batch_ids"))
      .filter(col("all_ids").isNotNull && size(col("all_ids")) >= 2 &&
        size(col("batch_ids")) >= 1)
      .select(batch_list_pairs(col("all_ids"), col("batch_ids")))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaGen === Set((1L, 3L)), s"self-pairs leaked: $viaGen")
  }
}
