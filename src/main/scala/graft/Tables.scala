package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading + oracle-stable numeric helpers shared by all query modules. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) which Spark reads as long only
    // under spark.sql.legacy.parquet.nanosAsLong; convert to micros exactly
    // (integer division — a double division would lose precision at 1e18).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None => df
    }
  }

  /** Money columns in the testdata are exact 2-decimal doubles. Summing them as
    * doubles is summation-order-dependent (Spark partial aggs vs DuckDB), so
    * hash-compare would flake. Instead: scale to an exact integer unit per row
    * (deterministic IEEE ops on identical inputs), sum as BIGINT (associative,
    * exact), and divide once at the end. Mirrors the SQL the oracle runs.
    */
  def exactSum(e: Column, scale: Long): Column =
    sum(round(e * scale, 0).cast("long")).cast("double") / scale.toDouble

  /** Exact average via integer-unit sum / count — deterministic both engines. */
  def exactAvg(e: Column, scale: Long): Column =
    sum(round(e * scale, 0).cast("long")).cast("double") / scale.toDouble / count(lit(1))

  /** SQL fragment mirroring exactSum for the DuckDB oracle. */
  def sqlExactSum(expr: String, scale: Long): String =
    s"CAST(SUM(CAST(round(($expr) * $scale, 0) AS BIGINT)) AS DOUBLE) / $scale.0"

  def sqlExactAvg(expr: String, scale: Long): String =
    s"CAST(SUM(CAST(round(($expr) * $scale, 0) AS BIGINT)) AS DOUBLE) / $scale.0 / count(*)"
}

/** A named group of driver-contract queries with their DuckDB oracles. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB SQL over the same tables; omit keys that aren't SQL-expressible. */
  def oracleSql: Map[String, String]
}
