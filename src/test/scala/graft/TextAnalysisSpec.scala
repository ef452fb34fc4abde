package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("text_commonness: exact counts on an engineered micro-corpus") {
    // corpus counts: a=4 (3 in d1, 1 in d2), b=1, c=1
    val tmp = java.nio.file.Files.createTempDirectory("graft-common-").toString
    import spark.implicits._
    Seq(1L -> "a a a", 2L -> "a b", 3L -> "c")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("text_commonness")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === ((3L, 4.0, 4L, 1.0)))      // mean 4, min 4
    assert(got(2L) === ((2L, 2.5, 1L, 1.0)))      // (4+1)/2
    assert(got(3L) === ((1L, 1.0, 1L, 1.0)))
  }

  test("text_commonness plan: Zipf head joins broadcast; tok shuffles bounded") {
    val plan = SparkEntry.queries("text_commonness")(spark, sf)
      .queryExecution.executedPlan.toString
    // the skewed keys (the frequency head) must be absorbed by a broadcast
    // join, never a shuffled join keyed on the Zipf distribution
    assert(plan.contains("BroadcastHashJoin"),
      s"frequency head not broadcast:\n$plan")
    // tok-keyed exchanges: the dictionary groupBy (reused by head+tail via
    // ReusedExchange) + the tail join's probe-side exchange
    val tokShuffles = "hashpartitioning\\(tok#".r.findAllMatchIn(plan).size
    assert(tokShuffles <= 3,
      s"token stream shuffled $tokShuffles times on tok:\n$plan")
  }
}
