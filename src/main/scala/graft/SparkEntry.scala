package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All query modules; each contributes `queries` + `oracleSql` entries. */
  private def modules: Seq[QueryModule] = Seq(
    operators.Analytics,
    operators.VectorSearch,
    operators.TextAnalysis,
    operators.Dedup,
    operators.Sampling,
    operators.Multimodal,
    operators.VectorIndex,
    operators.Temporal,
    operators.Pipeline,
    operators.LanceOps,
    operators.StreamingOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
