package graft

import org.apache.spark.sql.functions._

/** The codegen'd LM scoring expression must equal the explode → broadcast
  * join → shuffle pipeline it replaced, bigram for bigram. */
class LmScoreSpec extends SparkSpec {

  test("lm_doc_score equals the join-pipeline scoring on the corpus; zero scoring shuffles") {
    val d = Tables.t(spark, sf, "documents").filter(length(col("text")) >= 2)
    // train exactly as the operator does
    val big = d.select(col("doc_id"),
      explode(transform(sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))).as("g"))
    val c2 = big.groupBy("g").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring(col("g"), 1, 1).as("p")).agg(sum("c2").as("c1"))
    val probs = c2.join(c1, substring(col("g"), 1, 1) === col("p"))
      .select(col("g"),
        round(col("c2").cast("double") / col("c1") * 1e9, 0).cast("long").as("p_nano"))

    // the OLD scoring pipeline, verbatim
    val viaJoin = big.join(broadcast(probs), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p_nano").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // the expression
    val tbl = probs.collect()
    val viaExprDf = d.select(col("doc_id"),
      graft.functions.lm_doc_score(col("text"),
        tbl.map(_.getString(0)), tbl.map(_.getLong(1))).as("st"))
    val viaExpr = viaExprDf.collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1).head, r.getSeq[Long](1)(1)))).toMap
    assert(viaExpr === viaJoin)
    assert(viaExpr.nonEmpty)

    // the scoring stage itself is exchange-free (pure map over the scan)
    val plan = viaExprDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("char_bigrams equals the transform+substr phrasing on the corpus") {
    val d = Tables.t(spark, sf, "documents").filter(length(col("text")) >= 2)
    val viaSubstr = d.select(col("doc_id"),
        transform(sequence(lit(1), length(col("text")) - 1),
          i => col("text").substr(i, lit(2))).as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaExpr = d.select(col("doc_id"),
        graft.functions.char_bigrams(col("text")).as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaExpr === viaSubstr)
    // non-BMP: surrogate pairs stay whole
    import spark.implicits._
    val g = Seq("a😀b").toDF("t")
      .select(graft.functions.char_bigrams(col("t"))).collect().head.getSeq[String](0)
    assert(g === Seq("a😀", "😀b"))
  }

  test("lm_doc_score handles non-BMP code points like Spark substr") {
    import spark.implicits._
    // "a😀b": code-point bigrams are "a😀" and "😀b"
    val text = "a😀b"
    val grams = Array("a😀", "😀b")
    val nanos = Array(7L, 11L)
    val got = Seq(text).toDF("text")
      .select(graft.functions.lm_doc_score(col("text"), grams, nanos).as("st"))
      .collect().head.getSeq[Long](0)
    assert(got === Seq(2L, 18L))
    // cross-check against Spark's own substr bigrams
    val sparkGrams = Seq(text).toDF("text")
      .select(explode(transform(sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))).as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(sparkGrams === grams.toSeq)
  }
}
