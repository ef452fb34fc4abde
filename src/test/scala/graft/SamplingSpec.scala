package graft

import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("sample_hash: deterministic, partition-order independent, ~90/5/5") {
    val a = SparkEntry.queries("sample_hash")(spark, sf).collect()
    val b = SparkEntry.queries("sample_hash")(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    // split is a pure function of doc_id — recompute on a reshuffled copy
    // and it must agree row for row
    val reshuffled = spark.read.parquet(s"$sf/documents.parquet")
      .repartition(7, col("source"))
      .select(col("doc_id"),
        ((col("doc_id") * 48271L) % 2147483647L * 48271L) % 2147483647L % 100)
      .toDF("doc_id", "pct")
    val byId = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    reshuffled.collect().foreach { r =>
      assert(byId(r.getLong(0)) === r.getLong(1))
    }
    // fractions: 500 docs, expect ~450/25/25 with generous slack
    val splits = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(splits("train") > 400 && splits("train") < 490, splits.toString)
    assert(splits.getOrElse("validation", 0) > 5, splits.toString)
    assert(splits.getOrElse("test", 0) > 5, splits.toString)
    assert(splits.values.sum === 500)
  }

  test("sample_token_budget: per-source budget holds; kept = quality-ranked prefix") {
    val res = SparkEntry.queries("sample_token_budget")(spark, sf).collect()
    // budget never exceeded
    assert(res.forall(_.getLong(4) <= 800L))
    // the kept docs of each source are exactly the longest quality-ranked
    // prefix whose running token sum fits the budget
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("w", filter(split(col("text"), "\\s+"), x => x =!= ""))
    val nTok = size(col("w")).cast("double")
    val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val stopCnt = size(filter(col("w"), x => x.isin(stopEn: _*))).cast("double")
    val dr = size(array_distinct(col("w"))).cast("double") / nTok
    val q = least(lit(1.0), nTok / 100.0) * 0.4 + dr * 0.4 +
      least(lit(1.0), stopCnt / nTok * 5.0) * 0.2
    val scored = d.select(col("source"), col("doc_id"),
        size(col("w")).cast("long").as("n"), round(q, 6).as("quality"))
      .collect()
      .groupBy(_.getString(0))
    val expected = scored.toSeq.flatMap { case (_, rows) =>
      val ranked = rows.toSeq.sortBy(r => (-r.getDouble(3), r.getLong(1)))
      var cum = 0L
      ranked.takeWhile { r => cum += r.getLong(2); cum <= 800L }.map(_.getLong(1))
    }.toSet
    assert(res.map(_.getLong(1)).toSet === expected)
  }

  test("plan shapes: sample_hash shuffles nothing; token budget shuffles once on source") {
    val hashPlan = SparkEntry.queries("sample_hash")(spark, sf)
      .queryExecution.executedPlan.toString
    // the split assignment itself is map-only: the only exchange allowed
    // is the final presentation orderBy's range partitioning
    assert(!hashPlan.contains("hashpartitioning"),
      s"sample_hash plans a hash shuffle:\n$hashPlan")
    val budgetPlan = SparkEntry.queries("sample_token_budget")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashExchanges = "hashpartitioning\\(source".r
      .findAllMatchIn(budgetPlan).size
    assert(hashExchanges === 1,
      s"expected exactly one source-keyed shuffle, got $hashExchanges:\n$budgetPlan")
  }
}
