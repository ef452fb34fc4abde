package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — the as-of join (attach the most recent order at or
  * before each event's timestamp, per user) that native Spark lacks as an
  * operator.
  *
  * Implementation is the scale-correct single-shuffle formulation: union
  * the two sides tagged, sort within each user partition by time (build
  * side first on ties), and carry the build side's columns forward with a
  * running `last(_, ignoreNulls = true)` window. One shuffle on the join
  * key, no range join, no per-row probe — at 100 TB this is a sort-merge
  * pass, and skewed users can be salted by time-bucketing the partition
  * key.
  *
  * Order timestamps are disambiguated by adding `o_orderkey` microseconds
  * (orderkeys are unique → as-of picks are unique → deterministic and
  * oracle-matchable; the ≤1.5s shift is the documented tiebreak rule).
  */
object Temporal extends QueryModule {
  import Tables._

  private def asofOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").select(
      col("o_custkey").as("user_id"),
      // o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the cast
      // is exact, and the result type matches the events ts column
      timestamp_micros(unix_micros(col("o_orderdate").cast("timestamp")) + col("o_orderkey")).as("t"),
      col("o_orderkey"), col("o_totalprice"),
      lit(1).as("is_build"))
    val events = t(s, dir, "events").select(
      col("user_id"), col("ts").as("t"), col("event_id"), col("event_type"),
      lit(0).as("is_build"))
    val unioned = orders.unionByName(events, allowMissingColumns = true)
    // ties: the order row sorts before the event row at equal t → `<=`
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("is_build").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("last_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_build") === 0)
      // deterministic sample keeps the verified output small while the
      // join itself runs over every event
      .filter(col("event_id") % 100 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("last_orderkey"), col("last_totalprice"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_orders" -> asofOrders)

  val oracleSql: Map[String, String] = Map(
    "q_asof_orders" ->
      """WITH o AS (
        |  SELECT o_custkey AS user_id,
        |    o_orderdate + to_microseconds(o_orderkey) AS t,
        |    o_orderkey, o_totalprice
        |  FROM orders)
        |SELECT e.event_id, e.user_id, e.event_type,
        |  o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.t
        |WHERE e.event_id % 100 = 0
        |ORDER BY e.event_id""".stripMargin)
}
