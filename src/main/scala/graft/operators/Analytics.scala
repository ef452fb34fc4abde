package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic/bench headliner queries (TPC-H-ish) over the driver testdata.
  *
  * These exercise the classic OLAP shapes the reference's SQL surface covers
  * (scan+filter+agg, multi-way joins, top-k, windows) re-expressed with the
  * DataFrame API so Catalyst handles pushdown/broadcast/AQE. All money math
  * uses exact integer units (see [[graft.Tables.exactSum]]) so the DuckDB
  * oracle hash-matches deterministically.
  */
object Analytics extends QueryModule {
  import Tables._

  private def q1(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
        exactSum(col("l_extendedprice"), 100L).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 1000000L).as("sum_charge"),
        exactAvg(col("l_quantity"), 1L).as("avg_qty"),
        exactAvg(col("l_extendedprice"), 100L).as("avg_price"),
        exactAvg(col("l_discount"), 100L).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"), col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private def q5(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    t(s, dir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private def qWindow(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("revenue"))
    val w = Window.partitionBy("n_name").orderBy(col("revenue").desc, col("s_suppkey"))
    rev
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("s_suppkey"), col("s_name"), col("revenue"),
        rank().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy("n_name", "rnk", "s_suppkey")
  }

  private def qEvents(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value"), 100L).as("sum_value"))
      .orderBy("day", "event_type")
  }

  /** Daily event volume + 7-day trailing moving average. The window runs
    * over the DAILY AGGREGATE (30-ish rows regardless of data scale), so
    * the single-partition window after the groupBy is O(days), never
    * O(events) — aggregate-then-window is the scale-safe shape for
    * time-series smoothing. */
  private def qEventsMoving(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily.withColumn("ma7", round(avg(col("n")).over(w), 6)).orderBy("day")
  }

  /** Daily-volume anomaly detection — trailing z-score: each day's event
    * count against the mean/stddev of the PRIOR 7 days (the monitoring
    * primitive behind ingest alarms and data-quality gates). Variance
    * comes from integer window sums (Σn, Σn²) so every aggregate is
    * exact and order-independent; the only doubles are the final
    * divisions and one sqrt — both IEEE-bit-specified, so the z-score
    * hash-matches the oracle with no tolerance. Same scale shape as the
    * moving average: the window runs over the daily AGGREGATE (O(days)
    * rows), never over events. Days without a full 7-day history are
    * dropped rather than scored against a partial baseline. */
  private def qEventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("day").rowsBetween(-7, -1)
    val base = daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum("n").over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .filter(col("cnt") === 7)
    val mean = col("s1").cast("double") / lit(7.0d)
    val variance = (col("s2").cast("double")
      - col("s1").cast("double") * col("s1").cast("double") / lit(7.0d)) / lit(7.0d)
    base.select(col("day"), col("n"),
        round(mean, 6).as("mean7"),
        round(when(variance > 0.0d,
          (col("n").cast("double") - mean) / sqrt(variance))
          .otherwise(lit(0.0d)), 6).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 2.0d)
      .orderBy("day")
  }

  /** Ordered conversion funnel (view → click → purchase, strictly later
    * stages only): the product-analytics staple. Each stage is a
    * conditional-min aggregate joined to the previous stage's users —
    * every shuffle keys on user_id, so the three stages REUSE one
    * partitioning, and stage outputs shrink monotonically (broadcastable
    * dims against the big event scan at 100 TB). */
  private def qEventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.select(count(lit(1)).as("n_view_users"))
      .crossJoin(c.select(count(lit(1)).as("n_click_conv")))
      .crossJoin(p.select(count(lit(1)).as("n_purchase_conv")))
      .select(col("n_view_users"), col("n_click_conv"), col("n_purchase_conv"),
        round(col("n_purchase_conv").cast("double") / col("n_view_users"), 6)
          .as("conv_rate"))
  }

  /** Cohort retention — the other product-analytics staple next to the
    * funnel: cohort = each user's first active day; for day offsets
    * 0..14, how many of that cohort were active again exactly k days
    * later. Scale shape: distinct to (user, day) is the only
    * event-volume shuffle; the cohort day comes from a min-over-window
    * on user_id (no self-join, no second pass over events), and the
    * final groupBy lands on (cohort_day, offset) — O(days²) rows
    * regardless of corpus size. All stages whole-stage codegen. `ts`
    * casts to TimestampType first so the op accepts either parquet
    * timestamp flavor (see StreamingOps on NTZ). */
  private def qEventsRetention(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("timestamp").cast("date").as("d"))
      .distinct()
      .withColumn("cohort_day", min("d").over(Window.partitionBy("user_id")))
      .withColumn("offset_days", datediff(col("d"), col("cohort_day")).cast("long"))
      .filter(col("offset_days") <= 14)
      .groupBy("cohort_day", "offset_days")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "offset_days")
  }

  /** DAU / trailing-7-day WAU / stickiness per day. WAU needs DISTINCT
    * users across a 7-day window — not derivable from daily aggregates —
    * so each (user, day) row fans out to the 7 window-ending days it
    * belongs to (a bounded ×7 of the distinct user-day set, NOT of raw
    * events) and a distinct-count lands per day. Both aggregates reuse
    * the (user, day) distinct — the only event-volume shuffle; the final
    * join is O(days). Early days report clipped-lookback WAU, standard
    * for the metric. */
  private def qEventsDau(s: SparkSession, dir: String): DataFrame = {
    val ud = t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("timestamp").cast("date").as("d"))
      .distinct()
    val dau = ud.groupBy(col("d").as("day"))
      .agg(count_distinct(col("user_id")).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
      .groupBy("day").agg(count_distinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  /** The sketch twin of q_events_dau — DAU/WAU from MERGEABLE HLL
    * summaries: each day's users sketch ONCE (one shuffle), and WAU(day)
    * is the register-wise merge of that day's trailing 7 daily sketches —
    * 7 × 2 KB register arrays per output row instead of re-exploding the
    * event stream 7× the way the exact form must (the same
    * exact-vs-sketch scale trade q_events_percentiles documents). At
    * 100 TB daily sketches are a few MB total and every windowed unique
    * (WAU/MAU/rolling-28d) re-aggregates them for free. ~2.3% standard
    * error (p=11); rows-only key, exact-envelope spec'd. */
  private def qEventsDauHll(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("timestamp").cast("date").as("d"))
      .groupBy("d")
      .agg(graft.functions.hll_sketch(col("user_id")).as("sk"))
    val wau = daily
      .select(explode(sequence(col("d"), date_add(col("d"), 6))).as("day"), col("sk"))
      .groupBy("day")
      .agg(graft.functions.hll_merge(col("sk")).as("wsk"))
    daily.select(col("d").as("day"), graft.functions.hll_estimate(col("sk")).as("dau_approx"))
      .join(wau.select(col("day"), graft.functions.hll_estimate(col("wsk")).as("wau_approx")), "day")
      .select(col("day"), col("dau_approx"), col("wau_approx"),
        round(col("dau_approx").cast("double") / col("wau_approx"), 6).as("stickiness_approx"))
      .orderBy("day")
  }

  /** Exact per-event-type value percentiles as ORDER STATISTICS — rank
    * ceil(p·n) under (value, event_id) total order, the engine-independent
    * definition (no interpolation arithmetic → selected elements
    * hash-match bit-exactly; ties broken by event_id so the rank is
    * well-defined). Shape: ONE shuffle on event_type shared by both
    * window frames (row_number needs the sort; count rides the same
    * partitioning), then the group-by collapses on the same key — so the
    * exact form costs one sort-shuffle, viable per-group into the
    * billions. Past that, the mergeable-sketch companion
    * `q_events_percentiles_approx` is the 100-TB path. */
  private def qEventsPercentiles(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("event_id"), col("value"))
    val byVal = Window.partitionBy("event_type")
      .orderBy(col("value").asc, col("event_id").asc)
    ev.withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("n")).as("n_events"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("value"))).as("p50_value"),
        max(when(col("rn") === expr("(n * 90 + 99) div 100"), col("value"))).as("p90_value"),
        max(when(col("rn") === expr("(n * 99 + 99) div 100"), col("value"))).as("p99_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type")
  }

  /** The sketch form of the percentiles — approx_percentile's mergeable
    * quantile summary (map-side partial summaries merge associatively, no
    * global sort, bounded memory per group), i.e. the shape that replaces
    * the exact sort at 100 TB. rows-only gated key (the sketch's picks are
    * algorithm-specific, no SQL twin); the spec pins each reported value
    * inside the exact ±1%-rank envelope computed independently. */
  private def qEventsPercentilesApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        percentile_approx(col("value"), lit(0.50), lit(10000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.90), lit(10000)).as("p90_value"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99_value"))
      .orderBy("event_type")

  /** TPC-H Q4-shaped priority check (the EXISTS / left-semi shape): orders
    * placed in 1996Q1 that had at least one LATE line — shipped more than
    * 60 days after the order date — counted by priority. The EXISTS is a
    * LEFT SEMI join, so the probe side dedups inside the join (no
    * post-join distinct over the fact table) and each order carries at
    * most one output row no matter how many late lines it has. The
    * quarter filter cuts orders BEFORE the join; the lineitem side ships
    * only (l_orderkey, l_shipdate). One equi-key shuffle; the interval
    * predicate rides the join as a residual condition. */
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6-shaped forecast revenue: the pure scan-filter-aggregate
    * shape — at 100 TB this is the query where pushdown does ALL the
    * work: the shipdate range prunes row groups/fragments via min-max
    * stats, the scan reads only the 4 referenced columns, and the
    * aggregate reduces map-side to one row per task before a single
    * 1-row exchange. The spec asserts the filters actually reach the
    * parquet scan (PushedFilters) and the scan schema is pruned. */
  private def q6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(exactSum(col("l_extendedprice") * col("l_discount"), 1000000L).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Hierarchical totals via ROLLUP — (flag, status), per-flag subtotals
    * and the grand total in ONE pass: Spark expands the grouping sets
    * map-side and aggregates all three levels through a single shuffle
    * (vs three separate scans+shuffles for the UNION ALL phrasing). The
    * data has no NULL flag/status, so COALESCE to 'ALL' is an unambiguous
    * subtotal label both engines compute identically. */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L).as("revenue"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("revenue"))
      .orderBy("returnflag", "linestatus")

  private val TopkK = 5
  private val TopkCapacity = 64

  /** Exact top-5 users by event count per type: one (type, user) count
    * shuffle, then the rank filter rewrites to a pre-shuffle k-heap
    * (InferWindowGroupLimit) so only k rows per group reach the window
    * sort — the exact form, viable while the (type, user) count table is
    * shuffle-able. Past that, the sketch companion below is the path. */
  private def qEventsTopk(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events")
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy(col("n").desc, col("user_id").asc)
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopkK)
      .orderBy("event_type", "rk")
  }

  /** The mergeable-sketch form: Misra-Gries heavy hitters as a custom
    * TypedImperativeAggregate — aggregation state is bounded at
    * `TopkCapacity` counters per group regardless of user cardinality
    * (map-side partials merge associatively via guarantee-preserving
    * subtract-and-evict), replacing the exact form's
    * distinct-(type, user)-sized shuffle at 100 TB. Each reported item
    * carries its own [count_lo, count_hi] bound — the MG error surfaced,
    * not assumed. rows-only key (sketch contents are algorithm-specific);
    * the spec checks the bounds against exact counts and that
    * capacity >= cardinality collapses the sketch to exact. */
  private def qEventsTopkSketch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(graft.functions.heavy_hitters(col("user_id"), TopkK, TopkCapacity).as("hh"))
      .select(col("event_type"), posexplode(col("hh")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rk"),
        col("col.item").as("user_id"),
        col("col.count_lo").as("count_lo"), col("col.count_hi").as("count_hi"))
      .orderBy("event_type", "rk")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> q1,
    "q_events_topk" -> qEventsTopk,
    "q_events_topk_sketch" -> qEventsTopkSketch,
    "q4_priority" -> q4,
    "q6_forecast" -> q6,
    "q_rollup_pricing" -> qRollup,
    "q_events_percentiles" -> qEventsPercentiles,
    "q_events_percentiles_approx" -> qEventsPercentilesApprox,
    "q3_top_orders" -> q3,
    "q5_region_rev" -> q5,
    "q_window_topsupp" -> qWindow,
    "q_events_sessions" -> qEvents,
    "q_events_funnel" -> qEventsFunnel,
    "q_events_moving" -> qEventsMoving,
    "q_events_anomaly" -> qEventsAnomaly,
    "q_events_retention" -> qEventsRetention,
    "q_events_dau" -> qEventsDau,
    "q_events_dau_hll" -> qEventsDauHll)

  private val revenue = sqlExactSum("l_extendedprice * (1 - l_discount)", 10000L)

  val oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
         |  ${sqlExactSum("l_extendedprice", 100L)} AS sum_base_price,
         |  $revenue AS sum_disc_price,
         |  ${sqlExactSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1000000L)} AS sum_charge,
         |  ${sqlExactAvg("l_quantity", 1L)} AS avg_qty,
         |  ${sqlExactAvg("l_extendedprice", 100L)} AS avg_price,
         |  ${sqlExactAvg("l_discount", 100L)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
         |  $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-07-01' AND l_shipdate > TIMESTAMP '1998-07-01'
         |GROUP BY l_orderkey, orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_rev" ->
      s"""SELECT n_name, $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window_topsupp" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $revenue AS revenue FROM lineitem GROUP BY l_suppkey)
         |SELECT n_name, s_suppkey, s_name, revenue,
         |  rank() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS rnk
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |QUALIFY rnk <= 3 ORDER BY n_name, rnk, s_suppkey""".stripMargin,
    "q_events_sessions" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         |  count(*) AS n, ${sqlExactSum("value", 100L)} AS sum_value
         |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,
    "q_events_funnel" ->
      // DuckDB reads the raw NANOS timestamps; truncate to micros so
      // strict-inequality stage ordering matches Spark's micros exactly
      """WITH e AS (SELECT user_id, event_type,
        |    date_trunc('microseconds', ts) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view_users,
        |  (SELECT count(*) FROM c) AS n_click_conv,
        |  (SELECT count(*) FROM p) AS n_purchase_conv,
        |  round(CAST((SELECT count(*) FROM p) AS DOUBLE)
        |    / (SELECT count(*) FROM v), 6) AS conv_rate""".stripMargin,
    "q_events_dau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM
        |  (SELECT user_id, d + CAST(x AS INTEGER) AS day
        |   FROM ud, generate_series(0, 6) AS t(x))
        |  GROUP BY 1)
        |SELECT dau.day, dau, wau,
        |  round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "q_events_retention" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id)
        |SELECT c.cohort_day, CAST(e.d - c.cohort_day AS BIGINT) AS offset_days,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |WHERE e.d - c.cohort_day <= 14
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_percentiles" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value ASC, event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, max(n) AS n_events,
        |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN value END) AS p50_value,
        |  max(CASE WHEN rn = (n * 90 + 99) // 100 THEN value END) AS p90_value,
        |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN value END) AS p99_value,
        |  max(value) AS max_value
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_moving" ->
      """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT day, n,
        |  round(avg(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
        |FROM d ORDER BY day""".stripMargin,
    "q_events_topk" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, n, rk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
        |    ORDER BY n DESC, user_id ASC) AS BIGINT) AS rk FROM c)
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast" ->
      s"""SELECT ${sqlExactSum("l_extendedprice * l_discount", 1000000L)} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q_rollup_pricing" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  count(*) AS n, $revenue AS revenue
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "q_events_anomaly" ->
      """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |w AS (SELECT day, n,
        |    count(*) OVER win AS cnt,
        |    CAST(sum(n) OVER win AS BIGINT) AS s1,
        |    CAST(sum(n * n) OVER win AS BIGINT) AS s2
        |  FROM d WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT day, n,
        |    round(CAST(s1 AS DOUBLE) / 7.0, 6) AS mean7,
        |    round(CASE WHEN (CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 7.0 > 0.0
        |      THEN (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
        |        / sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 7.0)
        |      ELSE 0.0 END, 6) AS z
        |  FROM w WHERE cnt = 7)
        |SELECT day, n, mean7, z, (abs(z) > 2.0) AS is_anomaly
        |FROM z ORDER BY day""".stripMargin)
}
