package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q_events_anomaly: z-scores equal a driver-side recomputation; aggregate-then-window plan") {
    val df = SparkEntry.queries("q_events_anomaly")(spark, sf)
    val got = df.collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))

    // independent recomputation from the raw daily counts
    val daily = Tables.t(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))

    assert(got.length === daily.length - 7,
      "every day with a full 7-day history must be scored, and only those")
    val expected = daily.sliding(8).map { win =>
      val hist = win.take(7).map(_._2)
      val (day, n) = win.last
      val s1 = hist.sum; val s2 = hist.map(x => x * x).sum
      val mean = s1.toDouble / 7.0
      val variance = (s2.toDouble - s1.toDouble * s1.toDouble / 7.0) / 7.0
      val z = if (variance > 0.0) (n.toDouble - mean) / math.sqrt(variance) else 0.0
      val zr = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      day -> ((n,
        BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        zr, math.abs(zr) > 2.0))
    }.toSeq
    assert(got.toSeq === expected)

    // the stddev window must run over the daily AGGREGATE, not raw events:
    // plan order is scan → hash-aggregate → window (never window-over-scan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert("(?s)Window.*HashAggregate.*Scan".r.findFirstIn(plan).isDefined,
      s"window does not sit above the daily aggregate:\n$plan")
  }
}
