package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q_events_percentiles: hand-computed ranks; one shuffle; approx inside exact envelope") {
    // engineered events: type A has values 1..10 — rank ceil(p·n) picks
    // p50=5, p90=9, p99=10; type B has a single value
    val tmp = java.nio.file.Files.createTempDirectory("graft-pct-").toString
    import spark.implicits._
    ((1 to 10).map(i => (i.toLong, "A", i.toDouble)) :+ ((99L, "B", 42.0)))
      .toDF("event_id", "event_type", "value").write.mode("overwrite")
      .parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q_events_percentiles")(spark, tmp).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got("A") === ((10L, 5.0, 9.0, 10.0, 10.0)))
    assert(got("B") === ((1L, 42.0, 42.0, 42.0, 42.0)))

    // both window frames and the final groupBy share ONE event_type
    // shuffle (the second hashpartitioning exchange would be the scale
    // bug); the remaining exchanges are the single-partition presentation
    // sort, not data-volume shuffles
    val plan = SparkEntry.queries("q_events_percentiles")(spark, tmp)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx === 1, s"expected one event_type shuffle, got $hashEx:\n$plan")

    // the mergeable-sketch companion stays inside the exact ±1%-rank
    // envelope on the real corpus (its 100-TB contract)
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val approx = SparkEntry.queries("q_events_percentiles_approx")(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(approx.nonEmpty)
    approx.foreach { case (tpe, picks) =>
      val sortedVals = ev(tpe); val n = sortedVals.length
      picks.zip(Seq(0.50, 0.90, 0.99)).foreach { case (v, p) =>
        val lo = sortedVals(math.max(0, math.ceil((p - 0.01) * n).toInt - 1))
        val hi = sortedVals(math.min(n - 1, math.ceil((p + 0.01) * n).toInt - 1))
        assert(v >= lo && v <= hi, s"$tpe p$p pick $v outside [$lo, $hi]")
      }
    }
  }

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
