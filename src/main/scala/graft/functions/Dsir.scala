package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed n-gram featurization + scoring for DSIR-style data selection
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): documents featurize as counts over `DsirHash.Buckets`
  * hashed word uni+bigrams, two bag-of-buckets distributions are fit
  * (target slice vs the selection pool), and each pool document scores by
  * its importance log-ratio Σ_gram λ[bucket(gram)].
  *
  * Both expressions walk the document ONCE over code points: tokens split
  * on the same whitespace class as `split(text, "\\s+")`, each token's
  * rolling hash (h·31 + codepoint mod 1e9+7 — the text_fingerprint
  * polynomial, so the DuckDB twin is the proven list_reduce form) and a
  * running 31^len power let the bigram hash extend the previous token's
  * hash in O(1): H(t1 ⧺ ' ' ⧺ t2) = ((H(t1)·31 + 32)·31^len(t2) + H(t2))
  * mod p — identical to rolling over the concatenated gram string. */
private[graft] object DsirHash {
  /** Feature dimensionality. DSIR's paper uses 10k; 1024 keeps the
    * armed-literal oracle compact while leaving bucket collisions the
    * same smoothing-dominated second-order effect. Deployment knob. */
  val Buckets = 1024
  private final val Mod = 1000000007L

  // Java regex \s (the tokenizer the text family gates on) is this exact
  // ASCII class
  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** Walk `s` once; for every word unigram and adjacent-word bigram call
    * `emit(bucket)`. Returns the gram count. */
  def walk(s: String, emit: Int => Unit): Long = {
    val len = s.length
    var i = 0
    var n = 0L
    var prevH = -1L // previous token's rolling hash (-1 = none)
    while (i < len) {
      // skip separators
      var cp = 0
      while (i < len && { cp = s.codePointAt(i); isWs(cp) })
        i += Character.charCount(cp)
      if (i < len) {
        // one token: rolling hash h and 31^len p
        var h = 0L
        var p = 1L
        while (i < len && !isWs({ cp = s.codePointAt(i); cp })) {
          h = (h * 31 + cp) % Mod
          p = (p * 31) % Mod
          i += Character.charCount(cp)
        }
        emit((h % Buckets).toInt); n += 1
        if (prevH >= 0) {
          val bi = (((prevH * 31 + 32) % Mod) * p + h) % Mod
          emit((bi % Buckets).toInt); n += 1
        }
        prevH = h
      }
    }
    n
  }
}

/** `dsir_gram_buckets(text)` → array<int> of the document's hashed-gram
  * buckets, one element per gram OCCURRENCE (the training pass explodes
  * this into the two global count vectors). */
case class DsirGramBuckets(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"dsir_gram_buckets needs string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    DsirGramBuckets.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirGramBuckets$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirGramBuckets {
  def eval(text: UTF8String): GenericArrayData = {
    val out = new java.util.ArrayList[Integer]()
    DsirHash.walk(text.toString, b => { out.add(b); () })
    new GenericArrayData(out.toArray)
  }
}

/** `dsir_doc_score(text, λ_micro)` → [n_grams, Σ λ_micro[bucket(gram)]]:
  * the scoring half as ONE codegen'd map expression — the trained
  * per-bucket importance log-ratios (integer micro-nats) ride the plan as
  * a reference array, each document scores in a single pass, and the only
  * exchange left in the operator is the top-k itself. */
case class DsirDocScore(child: Expression, lambdaMicro: IndexedSeq[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if lambdaMicro.length == DsirHash.Buckets =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"dsir_doc_score needs ${DsirHash.Buckets} weights, got ${lambdaMicro.length}")
    case t => TypeCheckResult.TypeCheckFailure(s"dsir_doc_score needs string, got $t")
  }

  // an IndexedSeq (not Array) so case-class equality is value-based and
  // canonicalization can unify identical score expressions
  @transient private lazy val lam: Array[Long] = lambdaMicro.toArray

  override def nullSafeEval(v: Any): Any =
    DsirDocScore.score(lam, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirLambda", lam, "long[]")
    // via MODULE$, not a static forwarder (see LmDocScore)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirDocScore$$.MODULE$$.score($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirDocScore {
  /** Static so interpreted eval and generated code share the arithmetic. */
  def score(lam: Array[Long], text: UTF8String): GenericArrayData = {
    var sum = 0L
    val n = DsirHash.walk(text.toString, b => { sum += lam(b); () })
    new GenericArrayData(Array(n, sum))
  }
}

/** `gumbel_micro(id)` — a DETERMINISTIC standard-Gumbel draw keyed by the
  * id, in integer micro-units: u = (minstd2(id)+1)/(2³¹) ∈ (0,1) (the same
  * double-MINSTD step the split/weighted keys use), g = −ln(−ln u) via
  * StrictMath (fdlibm — bit-identical across JVMs and platforms, unlike
  * Math.log's allowed-1-ulp intrinsics). The Gumbel-max trick's noise term
  * for sample_dsir_gumbel; rows-only territory by design (the Gumbel
  * quantile has no rational form, so no SQL engine reproduces it
  * bit-exactly). */
case class GumbelMicro(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gumbel_micro needs bigint, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    GumbelMicro.compute(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GumbelMicro$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GumbelMicro {
  private final val A = 48271L
  private final val M = 2147483647L // 2^31 - 1

  def compute(id: Long): Long = {
    // normalize into [0, M) first: a negative id would otherwise make the
    // Java % yield a negative h2 (u <= 0 → ln NaN), and id·A overflows
    // Long beyond ~1.9e14, breaking the MINSTD bijection
    val x = java.lang.Math.floorMod(id, M)
    val h1 = (x * A) % M
    val h2 = (h1 * A) % M
    // h2 ∈ [0, M-1] → u ∈ [1/(M+1), M/(M+1)] ⊂ (0, 1): both ln calls are
    // finite for every id
    val u = (h2 + 1.0) / (M + 1.0)
    math.round(1e6 * -StrictMath.log(-StrictMath.log(u)))
  }
}
