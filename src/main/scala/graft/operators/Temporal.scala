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

  /** Range join: per (sampled) event, the count/sum of the user's orders
    * in the trailing 7-day window. The user_id equality makes this an
    * ordinary shuffle equi-join with the time window as residual — no
    * range-join machinery needed, and it scales as a hash join on user_id.
    */
  private def rangeOrders(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
      .filter(col("event_id") % 100 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val orders = t(s, dir, "orders").select(
      col("o_custkey").as("user_id"),
      col("o_orderdate").cast("timestamp").as("ot"),
      col("o_orderkey"), col("o_totalprice"))
    events.join(orders,
      events("user_id") === orders("user_id") &&
        col("ot") >= col("ts") - expr("INTERVAL 7 DAYS") && col("ot") <= col("ts"),
      "left")
      .groupBy(col("event_id"), col("event_type"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        exactSum(col("o_totalprice"), 100L).as("sum_price"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_orders" -> asofOrders,
    "q_range_orders" -> rangeOrders)

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
        |ORDER BY e.event_id""".stripMargin,
    "q_range_orders" ->
      s"""SELECT e.event_id, e.event_type,
         |  count(o.o_orderkey) AS n_orders,
         |  ${sqlExactSum("o.o_totalprice", 100L)} AS sum_price
         |FROM events e
         |LEFT JOIN orders o ON e.user_id = o.o_custkey
         |  AND o.o_orderdate >= e.ts - INTERVAL 7 DAY AND o.o_orderdate <= e.ts
         |WHERE e.event_id % 100 = 0
         |GROUP BY e.event_id, e.event_type
         |ORDER BY e.event_id""".stripMargin)
}
