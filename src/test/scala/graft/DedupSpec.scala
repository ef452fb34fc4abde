package graft

import graft.functions.simhash
import org.apache.spark.sql.functions._

/** Equivalence tests for the bucketed dedup operators: the LSH/banded path
  * must reproduce the brute-force all-pairs result on sf0.001 — proving the
  * bucketing is a pure optimization, not a semantics change. */
class DedupSpec extends SparkSpec {

  private def toks = filter(split(col("text"), "\\s+"), x => x =!= "")

  test("minhash LSH pairs == brute-force jaccard pairs (sf0.001)") {
    val base = Tables.t(spark, sf, "documents")
      .withColumn("w", toks)
      .filter(size(col("w")) >= 3)
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(1, size(w) - 2), " +
          "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))"))
      .select(col("doc_id"), col("sh"))
    val a = base.select(col("doc_id").as("a_id"), col("sh").as("sa"))
    val b = base.select(col("doc_id").as("b_id"), col("sh").as("sb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("j", size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))))
      .filter(col("j") >= 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute)
  }

  test("simhash banded pairs == brute-force hamming pairs (sf0.001)") {
    val sigs = Tables.t(spark, sf, "documents")
      .withColumn("w", toks)
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), simhash(col("w"), 42L).as("sig"))
    val a = sigs.select(col("doc_id").as("a_id"), col("sig").as("siga"))
    val b = sigs.select(col("doc_id").as("b_id"), col("sig").as("sigb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("h", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("h") <= 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SparkEntry.queries("dedup_simhash")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
  }
}
