package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pipeline — the composition the
  * individual operators exist for:
  *
  *   1. exact dedup (content-hash groupBy, keep the lowest doc_id);
  *   2. near-dup removal via MinHash-LSH: for every verified pair with
  *      Jaccard >= 0.8, drop the higher doc_id;
  *   3. quality filter (the TextAnalysis score >= 0.45).
  *
  * Output is the per-source survivor count + mean quality. Every stage is
  * shuffle-bounded (hash groupBy, LSH bucket join, map-only filter), so the
  * pipeline is a fixed number of shuffles regardless of corpus size. The
  * DuckDB oracle replays the identical pipeline with all-pairs Jaccard
  * (equal to the LSH candidates at this threshold — recall ≈ 1-5e-8).
  */
object Pipeline extends QueryModule {
  import Tables._

  private val QualityTau = 0.45

  private def pipelineClean(s: SparkSession, dir: String): DataFrame = {
    // 1. exact dedup
    val docs = t(s, dir, "documents")
    val keepExact = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // 2. near-dup removal (reuses the LSH operator's verified pairs)
    val nearDupLosers = Dedup.lshPairs(s, dir)
      .select(col("b_id").as("doc_id")).distinct()
    val kept = keepExact
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
    // 3. quality filter + report. The survivor-id side is O(corpus) — a
    // broadcast hint here would collect billions of ids on the driver at
    // scale, so the join stays a shuffle on doc_id (AQE may still choose a
    // broadcast when the survivor set is genuinely small).
    docs.join(kept, Seq("doc_id"))
      .withColumn("w", TextAnalysis.tokens)
      .withColumn("q", TextAnalysis.qualityScore)
      .filter(col("q") >= QualityTau)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_kept"),
        // exact integer-unit average — plain avg(double) is
        // summation-order-dependent across partitions
        exactAvg(col("q"), 1000000L).as("avg_quality"))
      .orderBy("source")
  }

  // ---- pipeline_pretrain -------------------------------------------------
  private val SourceBudget = 1500L
  private val PackBudget = 2048L
  private val PackShards = 8

  /** The FULL pretraining-data pipeline in one declarative plan — what a
    * user of this library actually ships to produce training shards:
    * exact dedup → near-dup removal → quality filter → per-source token
    * budget (highest-quality documents first) → sequence packing into
    * ~2048-token shards. Five stages and still a FIXED number of shuffles
    * (content-hash groupBy, LSH bucket join, survivor join, one
    * source-window, one shard-window) no matter the corpus size; every
    * selection runs on rounded/integer arithmetic, so the DuckDB oracle
    * replays the identical pipeline end to end and the final shard report
    * hash-matches. */
  private def pipelinePretrain(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val keepExact = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val nearDupLosers = Dedup.lshPairs(s, dir)
      .select(col("b_id").as("doc_id")).distinct()
    val kept = keepExact.join(nearDupLosers, Seq("doc_id"), "left_anti")
    val scored = docs.join(kept, Seq("doc_id"))
      .withColumn("w", TextAnalysis.tokens)
      .withColumn("q", TextAnalysis.qualityScore)
      .filter(col("q") >= QualityTau)
      .select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("n_tokens"),
        round(col("q"), 6).as("quality"))
    val byQuality = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id").asc)
    val budgeted = scored
      .withColumn("cum_tokens",
        sum("n_tokens").over(byQuality.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= SourceBudget)
    TextAnalysis.pack(s, budgeted.select("doc_id", "n_tokens"), PackBudget, PackShards)
  }

  // ---- pipeline_curate ---------------------------------------------------
  private val CurateK = 150

  /** The CURATION recipe the r15 sampling additions compose into — how a
    * corpus-curation pass actually chains: exact dedup → quality filter →
    * token-mass-proportional subsample WITHOUT replacement
    * (Efraimidis–Spirakis exponential clocks over the survivors, the
    * sample_weighted primitive) → per-source mixture report. Four stages,
    * each shuffle-bounded: a content-hash groupBy, a map-only filter, one
    * TakeOrderedAndProject pass for the weighted draw, one |sources|-row
    * groupBy. The DuckDB oracle replays all four end to end and the
    * report hash-matches — the composition is verified, not just the
    * parts. */
  private def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val keepExact = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val survivors = docs.join(keepExact, Seq("doc_id"))
      .withColumn("w", TextAnalysis.tokens)
      .withColumn("q", TextAnalysis.qualityScore)
      .filter(col("q") >= QualityTau)
      .select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    survivors
      .withColumn("k", Sampling.weightedKey(col("doc_id"), col("n_tokens")))
      .orderBy(col("k").desc, col("doc_id").asc)
      .limit(CurateK)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("sum_tokens"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean" -> pipelineClean,
    "pipeline_curate" -> pipelineCurate,
    "pipeline_pretrain" -> pipelinePretrain)

  private val wSql = """list_filter(regexp_split_to_array(text, '[\t\n\x0B\f\r ]+'), x -> x != '')"""

  val oracleSql: Map[String, String] = Map(
    "pipeline_curate" ->
      s"""WITH keep_exact AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
         |sc0 AS (
         |  SELECT dd.doc_id, dd.source, CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST(len(w) AS DOUBLE) AS nt,
         |    CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE) AS sc,
         |    CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dr
         |  FROM (SELECT doc_id, source, $wSql AS w FROM documents) dd
         |  JOIN keep_exact USING (doc_id)),
         |survivors AS (
         |  SELECT doc_id, source, n_tokens FROM sc0
         |  WHERE $qualitySql >= $QualityTau AND n_tokens > 0),
         |picked AS (
         |  SELECT doc_id, source, n_tokens FROM (
         |    SELECT doc_id, source, n_tokens,
         |      ${Sampling.weightedKeySql("doc_id", "n_tokens")} AS k
         |    FROM survivors ORDER BY k DESC, doc_id ASC LIMIT $CurateK))
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM picked GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_clean" ->
      s"""WITH keep_exact AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
         |d AS (SELECT doc_id, $wSql AS w FROM documents),
         |g AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
         |  FROM d WHERE len(w) >= 3),
         |losers AS (
         |  SELECT DISTINCT b.doc_id FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
         |kept AS (
         |  SELECT doc_id FROM keep_exact WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |scored AS (
         |  SELECT doc_id, source, nt, sc, dr FROM (
         |    SELECT dd.doc_id, dd.source,
         |      CAST(len(w) AS DOUBLE) AS nt,
         |      CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE) AS sc,
         |      CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dr
         |    FROM (SELECT doc_id, source, $wSql AS w FROM documents) dd
         |    JOIN kept USING (doc_id)))
         |SELECT source, count(*) AS n_kept,
         |  ${sqlExactAvg(s"($qualitySql)", 1000000L)} AS avg_quality
         |FROM scored WHERE $qualitySql >= $QualityTau
         |GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_pretrain" ->
      s"""WITH keep_exact AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
         |d0 AS (SELECT doc_id, $wSql AS w FROM documents),
         |g AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
         |  FROM d0 WHERE len(w) >= 3),
         |losers AS (
         |  SELECT DISTINCT b.doc_id FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
         |kept AS (
         |  SELECT doc_id FROM keep_exact WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |sc0 AS (
         |  SELECT dd.doc_id, dd.source, CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST(len(w) AS DOUBLE) AS nt,
         |    CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE) AS sc,
         |    CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dr
         |  FROM (SELECT doc_id, source, $wSql AS w FROM documents) dd
         |  JOIN kept USING (doc_id)),
         |scored AS (
         |  SELECT doc_id, source, n_tokens, round($qualitySql, 6) AS quality
         |  FROM sc0 WHERE $qualitySql >= $QualityTau),
         |budgeted AS (
         |  SELECT doc_id, n_tokens FROM (
         |    SELECT doc_id, n_tokens,
         |      CAST(sum(n_tokens) OVER (PARTITION BY source
         |        ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |    FROM scored) WHERE cum <= $SourceBudget),
         |p AS (SELECT doc_id, n_tokens, doc_id % $PackShards AS shard FROM budgeted),
         |c AS (SELECT *, sum(n_tokens) OVER
         |  (PARTITION BY shard ORDER BY doc_id) - n_tokens AS start FROM p)
         |SELECT shard, CAST(floor(start / $PackBudget.0) AS BIGINT) AS pack_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS first_doc
         |FROM c GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin)

  private def qualitySql: String = TextAnalysis.qualityScoreSql
}
