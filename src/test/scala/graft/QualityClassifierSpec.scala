package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Model-based quality scoring (`text_quality_classifier`): the distilled
  * NB model must actually learn the heuristic, recompute exactly from
  * first principles, and score as a pure map stage. */
class QualityClassifierSpec extends SparkSpec {

  test("classifier separates its weak labels well above chance") {
    val rows = SparkEntry.queries("text_quality_classifier")(spark, sf)
      .filter(col("weak_label") =!= -1L).collect()
      .map(r => (r.getLong(2), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val correct = rows.count { case (weak, pred) => (weak == 1L) == pred }
    val acc = correct.toDouble / rows.length
    assert(acc >= 0.75, s"train accuracy $acc — the model failed to learn the heuristic")
  }

  test("logits equal a driver-side exact recomputation on a sample") {
    val d = operators.TextAnalysis.docs(spark, sf).cache()
    val got = SparkEntry.queries("text_quality_classifier")(spark, sf)
      .limit(50).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap

    // recompute the model exactly as trainModel does, from raw pieces
    val m = QualityClassifier.trainModel(spark, d)

    // murmur3 buckets exactly as the Column expression computes them;
    // feature arrays via the shared featureTokens column (unigrams + the
    // binned stats)
    val tokens = d.orderBy("doc_id").limit(50)
      .select(col("doc_id"), QualityClassifier.featureTokens.as("f")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    import spark.implicits._
    val allToks = tokens.flatMap(_._2).distinct.toSeq
    val bucketOf = allToks.toDF("t")
      .select(col("t"), pmod(hash(col("t")), lit(QualityClassifier.Buckets)).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

    tokens.foreach { case (id, toks) =>
      val (words, stats) = toks.splitAt(toks.length - 3)
      var wSum = 0.0; var sSum = 0.0
      words.foreach(t => wSum += m.weights(bucketOf(t)))
      stats.foreach(t => sSum += m.weights(bucketOf(t)))
      val logit = m.prior + (if (words.nonEmpty) wSum / words.length else 0.0) + sSum
      val expected = BigDecimal(logit).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === expected, s"doc $id")
    }
    d.unpersist()
  }

  test("q_stream_classifier: streamed count deltas sum to the batch-trained model") {
    // additive counts + frozen thresholds ==> the streamed model IS the
    // batch model; outputs must match row for row
    val streamed = SparkEntry.queries("q_stream_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4))).toSeq
    val batch = SparkEntry.queries("text_quality_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(streamed === batch)
    assert(streamed.length === 500)
  }

  test("tertile thresholds are exact order statistics of the score histogram") {
    import spark.implicits._
    // 9 docs with scores 1..9 (as rounded quality values): ranks ceil(11/3)=3
    // and ceil(20/3)=6 → thresholds 3.0 and 6.0 hmm —  (n+2)/3 = 3, (2n+2)/3 = 6
    val scored = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "quality")
    val (lo, hi) = QualityClassifier.tertiles(scored)
    assert((lo, hi) === ((3.0, 6.0)))
  }

  test("scoring is a pure map stage: no exchange between scan and the logit projection") {
    val df = SparkEntry.queries("text_quality_classifier")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed in the SCORING plan is the presentation
    // orderBy (rangepartitioning); training runs as separate jobs before
    // the returned frame is built
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring plan shuffles:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"),
      s"scoring must use builtin expressions only:\n$plan")
  }
}
