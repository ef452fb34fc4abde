package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText-style linear classifier
  * every production corpus pipeline runs next to its heuristics (CCNet /
  * GPT-3 "wiki vs crawl", Dolma's quality taggers): DISTILL the rule-based
  * quality signal into a hashed bag-of-words Naive Bayes model, then score
  * every document with the model.
  *
  * Train/score shapes, all scale-honest:
  *
  *  1. weak labels from the existing heuristic ([[TextAnalysis.qualityScore]]):
  *     bottom tertile → 0, top tertile → 1, middle third unlabeled (the
  *     classic high-confidence-extremes recipe). Tertile thresholds are
  *     EXACT order statistics over the histogram of the (already
  *     6dp-rounded) score — the histogram groupBy is bounded by distinct
  *     score values, never corpus size, so the threshold pass is one
  *     bounded shuffle + a tiny driver cumsum: deterministic AND feasible
  *     where a global sort would not be.
  *  2. training counts: one (label, feature-bucket) shuffle with map-side
  *     partials; the model table is capped by construction at
  *     2 × 2^16 rows no matter the corpus, then collapses to a
  *     2^16-double log-likelihood-ratio array on the driver (plus-one
  *     smoothing).
  *  3. scoring: a PURE MAP stage — the weight array rides the plan as one
  *     array literal (≈0.5 MB, the broadcast-a-small-model pattern) and
  *     each doc folds `element_at(weights, bucket(token))` over its
  *     tokens with builtin codegen'd functions. No UDF, no shuffle, no
  *     per-row driver work; documents of any volume stream through.
  *
  * Feature bucketing uses Spark's `hash()` (murmur3) into 2^16 buckets —
  * collisions are part of the hashed-features contract (same as
  * fastText's hashing trick). rows-only gated key: no SQL engine computes
  * murmur3+log identically, so correctness is spec-gated (driver-side
  * exact recomputation + accuracy floor + map-only-scoring plan).
  */
object QualityClassifier {
  val Buckets: Int = 1 << 16

  /** Learned model: per-bucket log-likelihood ratios + class prior. */
  private[graft] case class Model(weights: Array[Double], prior: Double,
                                      qLo: Double, qHi: Double)

  private def bucketCol(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(hash(tok), lit(Buckets))

  /** Feature tokens over a tokenized `w` column: hashed unigrams PLUS the
    * binned document statistics a production quality model ships alongside
    * its n-grams (fastText-style pipelines concatenate engineered features
    * with the text features). The synthetic corpus draws every document
    * from the same vocabulary, so the statistics carry the learnable
    * signal here; on a real corpus the unigrams carry most of it — both
    * kinds ride the same hashing trick. */
  private[graft] def featureTokens: org.apache.spark.sql.Column = {
    val nTok = size(col("w")).cast("double")
    val stopCnt = size(filter(col("w"),
      x => x.isin(TextAnalysis.StopEn: _*))).cast("double")
    val dr = size(array_distinct(col("w"))).cast("double") / nTok
    concat(col("w"), array(
      concat(lit("#len:"), floor(log2(nTok + 1)).cast("int").cast("string")),
      concat(lit("#dr:"), floor(dr * 10).cast("int").cast("string")),
      concat(lit("#stop:"), floor(stopCnt / nTok * 25).cast("int").cast("string"))))
  }

  /** Exact tertile thresholds from the bounded score histogram. */
  private[graft] def tertiles(scored: DataFrame): (Double, Double) = {
    val hist = scored.groupBy("quality").count()
      .orderBy("quality").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    def valueAtRank(rank: Long): Double = {
      var cum = 0L
      hist.find { case (_, c) => cum += c; cum >= rank }.get._1
    }
    (valueAtRank((n + 2) / 3), valueAtRank((2 * n + 2) / 3))
  }

  /** Weak-label column for a tokenized frame under frozen thresholds. */
  private[graft] def labelCol(qLo: Double, qHi: Double): org.apache.spark.sql.Column = {
    val q = round(TextAnalysis.qualityScore, 6)
    when(q <= qLo, 0).when(q >= qHi, 1)
  }

  /** The (label, bucket) feature-count frame — bounded at 2 × Buckets
    * rows no matter the input; ADDITIVE, so per-batch deltas from a
    * stream sum to the batch-trained counts (q_stream_classifier). */
  private[graft] def featureCounts(labeled: DataFrame): DataFrame =
    labeled
      .select(col("label"), explode(featureTokens).as("tok"))
      .groupBy(col("label"), bucketCol(col("tok")).as("b"))
      .agg(count(lit(1)).as("n"))

  /** Assemble the model from collected counts + per-label doc totals. */
  private[graft] def modelFrom(counts: Array[(Int, Int, Long)],
                               nPos: Long, nNeg: Long,
                               qLo: Double, qHi: Double): Model = {
    val pos = new Array[Long](Buckets); val neg = new Array[Long](Buckets)
    counts.foreach { case (l, b, n) => if (l == 1) pos(b) = n else neg(b) = n }
    val posTotal = pos.sum; val negTotal = neg.sum
    // smooth by the OBSERVED vocabulary, not the hash space: a 2^16
    // denominator swamps the class totals and turns the class-size
    // imbalance into a constant per-token bias that drowns the signal
    val vocabSeen = counts.map(_._2).distinct.length
    val weights = Array.tabulate(Buckets) { b =>
      math.log((pos(b) + 1).toDouble / (posTotal + vocabSeen)) -
        math.log((neg(b) + 1).toDouble / (negTotal + vocabSeen))
    }
    Model(weights, math.log((nPos + 1).toDouble / (nNeg + 1)), qLo, qHi)
  }

  private[graft] def trainModel(s: SparkSession, docs: DataFrame): Model = {
    val scored = docs.select(col("doc_id"), col("w"),
      round(TextAnalysis.qualityScore, 6).as("quality"))
    val (qLo, qHi) = tertiles(scored)
    val labeled = docs.withColumn("label", labelCol(qLo, qHi))
      .filter(col("label").isNotNull)
    // one (label, bucket) shuffle; result bounded at 2 * Buckets rows
    val counts = featureCounts(labeled)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val Array(nPos, nNeg) = {
      val byLabel = labeled.groupBy("label").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      Array(byLabel.getOrElse(1, 0L), byLabel.getOrElse(0, 0L))
    }
    modelFrom(counts, nPos, nNeg, qLo, qHi)
  }

  /** Train on `dir`'s documents, then score ALL of them. */
  def run(s: SparkSession, dir: String): DataFrame =
    runOn(s, TextAnalysis.docs(s, dir))

  /** Train + score over an arbitrary tokenized frame (`w` column present)
    * — the seam soaks and own-corpus callers use. */
  def runOn(s: SparkSession, d: DataFrame): DataFrame =
    scoreWith(s, d, trainModel(s, d))

  /** Score a tokenized frame with an already-trained model. */
  private[graft] def scoreWith(s: SparkSession, d: DataFrame, m: Model): DataFrame = {
    // scoring: builtin-function fold over the token array against the
    // literal weight array — whole-stage-codegen map stage, zero shuffle
    val wLit = lit(m.weights)
    // fastText's scoring posture: text features are AVERAGED (a raw
    // multinomial sum is length-pathological — every token inherits a
    // constant bias from the class-size mismatch and long docs saturate
    // the sign), while the engineered statistics enter the linear layer
    // DIRECTLY (one occurrence each — averaging them into the text bag
    // would dilute them by 1/n_tokens).
    def llrSum(feats: org.apache.spark.sql.Column) =
      aggregate(transform(feats, tok => element_at(wLit, bucketCol(tok) + 1)),
        lit(0.0), (acc, x) => acc + x)
    val stats = slice(featureTokens, -3, 3)
    val logit = lit(m.prior) +
      coalesce(llrSum(col("w")) / size(col("w")).cast("double"), lit(0.0)) +
      llrSum(stats)
    d.select(
      col("doc_id"),
      round(TextAnalysis.qualityScore, 6).as("quality"),
      when(round(TextAnalysis.qualityScore, 6) <= m.qLo, 0L)
        .when(round(TextAnalysis.qualityScore, 6) >= m.qHi, 1L)
        .otherwise(-1L).as("weak_label"),
      round(logit, 6).as("nb_logit"),
      (logit > 0).as("nb_label"))
      .orderBy("doc_id")
  }
}
