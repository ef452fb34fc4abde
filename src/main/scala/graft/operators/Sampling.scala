package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus subsetting for training-data pipelines — the selection steps that
  * run after cleaning/dedup and before tokenization:
  *
  *  - `sample_hash`: deterministic hash-bucketed train/validation/test
  *    split. Splits must be REPRODUCIBLE across engines and runs (no RNG,
  *    no partition-order dependence), stable under corpus growth (a doc's
  *    split never changes when neighbors are added), and cheap (map-only).
  *    A double round of the MINSTD multiplicative congruential step
  *    decorrelates the id from its bucket using only overflow-safe 64-bit
  *    arithmetic, so DuckDB (which raises on BIGINT overflow rather than
  *    wrapping) computes the identical value — the property the oracle
  *    gate checks.
  *  - `sample_token_budget`: per-source token-budget selection — every
  *    source contributes its highest-quality documents until the source's
  *    token budget is exhausted (the composition of a per-domain quota
  *    with a token-count target that web-scale corpus recipes apply).
  *    One shuffle on `source`; the running sum is a prefix-sum window
  *    within each source partition.
  *
  * Scale posture: sample_hash is a pure projection (no shuffle, survives
  * any corpus size); sample_token_budget shuffles each source's rows to
  * one window partition — sources are the unit of parallelism, and a
  * pathologically hot source degrades to one task's sort, the same bound
  * as text_source_cap (no cross-source state).
  */
object Sampling extends QueryModule {
  import Tables._

  // ---- sample_hash -------------------------------------------------------
  // MINSTD (Lehmer) step: h -> h * 48271 mod (2^31 - 1). Two rounds give
  // bucket uniformity good enough for split assignment; every intermediate
  // stays far below 2^63 for any doc_id < 1.9e14, so the arithmetic is
  // portable to engines that refuse to wrap on overflow.
  private val MinstdA = 48271L
  private val MinstdM = 2147483647L // 2^31 - 1
  private val TrainPct = 90
  private val ValPct = 95 // [90, 95) validation, [95, 100) test

  private def minstd2(c: Column): Column = {
    val h1 = (c * MinstdA) % MinstdM
    (h1 * MinstdA) % MinstdM
  }

  private def sampleHash(s: SparkSession, dir: String): DataFrame = {
    val pct = minstd2(col("doc_id")) % 100
    t(s, dir, "documents").select(
      col("doc_id"),
      pct.as("pct"),
      when(pct < TrainPct, "train")
        .when(pct < ValPct, "validation")
        .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  // ---- sample_token_budget -----------------------------------------------
  private val TokenBudget = 800L

  private def sampleTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").withColumn("w", TextAnalysis.tokens)
    val scored = d.select(
      col("doc_id"), col("source"),
      size(col("w")).cast("long").as("n_tokens"),
      // the ROUNDED score orders selection (ties by doc_id) so Spark and
      // the oracle rank identically despite last-bit fp differences
      round(TextAnalysis.qualityScore, 6).as("quality"))
    val byQuality = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id").asc)
    scored
      .withColumn("cum_tokens",
        sum("n_tokens").over(byQuality.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= TokenBudget)
      .select("source", "doc_id", "quality", "n_tokens", "cum_tokens")
      .orderBy("source", "cum_tokens", "doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_hash" -> sampleHash,
    "sample_token_budget" -> sampleTokenBudget)

  private val wSql = """list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')"""

  val oracleSql: Map[String, String] = Map(
    "sample_hash" ->
      s"""WITH h AS (SELECT doc_id,
         |    ((doc_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM % 100 AS pct
         |  FROM documents)
         |SELECT doc_id, pct,
         |  CASE WHEN pct < $TrainPct THEN 'train'
         |       WHEN pct < $ValPct THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin,
    "sample_token_budget" ->
      s"""WITH d AS (SELECT doc_id, source, $wSql AS w FROM documents),
         |s AS (SELECT doc_id, source, len(w) AS n_tokens,
         |  CAST(len(w) AS DOUBLE) AS nt,
         |  CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE) AS sc,
         |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dr
         |  FROM d),
         |q AS (SELECT doc_id, source, n_tokens,
         |  round(${TextAnalysis.qualityScoreSql}, 6) AS quality FROM s),
         |c AS (SELECT source, doc_id, quality, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM q)
         |SELECT source, doc_id, quality, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens <= $TokenBudget
         |ORDER BY source, cum_tokens, doc_id""".stripMargin)
}
