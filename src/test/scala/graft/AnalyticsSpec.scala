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

  test("q_events_topk: rank filter becomes a pre-shuffle k-heap") {
    val df = SparkEntry.queries("q_events_topk")(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must run as a pre-shuffle heap, not a full window sort:\n$plan")
  }

  test("heavy_hitters: MG bounds hold vs exact counts; exact when capacity >= cardinality") {
    import spark.implicits._
    // corpus check: every reported item's true count sits inside [lo, hi]
    val sketch = SparkEntry.queries("q_events_topk_sketch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sketch.nonEmpty)
    val exact = Tables.t(spark, sf, "events")
      .groupBy("event_type", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    sketch.foreach { case (tpe, user, lo, hi) =>
      val truth = exact((tpe, user))
      assert(lo <= truth && truth <= hi, s"($tpe, $user): [$lo, $hi] excludes $truth")
    }

    // capacity >= distinct items ==> the sketch IS exact (d stays 0)
    val small = Seq.fill(30)(1L) ++ Seq.fill(20)(2L) ++ Seq.fill(10)(3L) ++ Seq(4L, 5L)
    val exactTop = small.toDF("item").repartition(7)
      .agg(graft.functions.heavy_hitters(col("item"), 3, 16).as("hh"))
      .select(explode(col("hh"))).select("col.*").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exactTop.toSeq === Seq((1L, 30L, 30L), (2L, 20L, 20L), (3L, 10L, 10L)))

    // engineered skew through a TINY sketch: the majority item must
    // survive merges across 7 partitions with truth inside its bounds
    val skewed = (Seq.fill(500)(42L) ++ (1L to 400L)).toDF("item").repartition(7)
      .agg(graft.functions.heavy_hitters(col("item"), 1, 4).as("hh"))
      .select(explode(col("hh"))).select("col.*").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(skewed.length === 1)
    val (item, lo, hi) = skewed.head
    assert(item === 42L, s"majority item lost: $item")
    assert(lo <= 500L && 500L <= hi, s"bounds [$lo, $hi] exclude 500")
  }

  test("q4_priority: EXISTS is a semi-join — multi-late-line orders count once") {
    // engineered fixture: order 1 has THREE late lines (would triple-count
    // under an inner join), order 2 has one on-time line, order 3 has one
    // late line but sits outside the quarter
    val tmp = java.nio.file.Files.createTempDirectory("graft-q4-").toString
    import spark.implicits._
    Seq((1L, 10L, "O", 1.0, java.sql.Timestamp.valueOf("1996-02-01 00:00:00"), "1-URGENT"),
        (2L, 11L, "O", 1.0, java.sql.Timestamp.valueOf("1996-02-01 00:00:00"), "1-URGENT"),
        (3L, 12L, "O", 1.0, java.sql.Timestamp.valueOf("1995-02-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val lateTs = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    val okTs = java.sql.Timestamp.valueOf("1996-02-15 00:00:00")
    Seq((1L, lateTs), (1L, lateTs), (1L, lateTs), (2L, okTs), (3L, lateTs))
      .map { case (k, ts) => (k, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val df = SparkEntry.queries("q4_priority")(spark, tmp)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("1-URGENT", 1L))) // order 1 once; order 2 on time; order 3 out of range
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi-join:\n$plan")
  }

  test("q6_forecast: filters reach the parquet scan; read schema is pruned") {
    val df = SparkEntry.queries("q6_forecast")(spark, sf)
    val r = df.collect().head
    assert(r.getLong(1) > 0)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan parquet")).mkString("\n")
    // discount/quantity/shipdate predicates must be pushed to the reader
    assert(scan.contains("PushedFilters") && scan.contains("l_discount"),
      s"filters not pushed:\n$scan")
    // only the 4 referenced columns in the read schema — no full-row reads
    Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice").foreach(c =>
      assert(scan.contains(c), s"$c missing from scan:\n$scan"))
    assert(!scan.contains("l_partkey") && !scan.contains("l_comment"),
      s"scan reads unreferenced columns:\n$scan")
  }

  test("q_rollup_pricing: one-pass rollup — levels reconcile and plan has one shuffle pass") {
    val rows = SparkEntry.queries("q_rollup_pricing")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val leaves = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val subtotals = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length === 1)
    // levels reconcile exactly (integer counts; revenue exact via integer units)
    assert(leaves.map(_._3).sum === grand.head._3)
    assert(subtotals.map(_._3).sum === grand.head._3)
    subtotals.foreach { st =>
      assert(leaves.filter(_._1 == st._1).map(_._3).sum === st._3)
    }
    assert(grand.head._3 === Tables.t(spark, sf, "lineitem").count())
  }

  test("q_events_dau_hll: sketch DAU/WAU inside the HLL error envelope; sketch-merge == union sketch") {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("q_events_dau")(spark, sf).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val approx = SparkEntry.queries("q_events_dau_hll")(spark, sf).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(approx.keySet === exact.keySet)
    // p=11 -> 2.3% std error; allow 4 sigma (~9.2%) plus small-count slack
    exact.foreach { case (day, (dau, wau)) =>
      val (da, wa) = approx(day)
      assert(math.abs(da - dau).toDouble <= math.max(4, 0.1 * dau),
        s"$day dau exact=$dau approx=$da")
      assert(math.abs(wa - wau).toDouble <= math.max(4, 0.1 * wau),
        s"$day wau exact=$wau approx=$wa")
    }
    // merge soundness: merging per-day sketches == sketching the union
    import spark.implicits._
    val a = Seq(1L, 2L, 3L).toDF("v").agg(graft.functions.hll_sketch(col("v")).as("s"))
    val b = Seq(3L, 4L).toDF("v").agg(graft.functions.hll_sketch(col("v")).as("s"))
    val merged = a.unionAll(b).agg(graft.functions.hll_merge(col("s")).as("m"))
      .select(graft.functions.hll_estimate(col("m"))).first().getLong(0)
    val direct = Seq(1L, 2L, 3L, 3L, 4L).toDF("v")
      .agg(graft.functions.hll_sketch(col("v")).as("s"))
      .select(graft.functions.hll_estimate(col("s"))).first().getLong(0)
    assert(merged === direct)
    assert(merged === 4L) // tiny cardinalities are exact under linear counting
  }

  test("q_stream_dau_hll: streamed sketch maintenance == the batch sketch key exactly") {
    // register-wise max is associative+commutative, so merging per-batch
    // sketches must reproduce the batch-built sketches BIT-identically -
    // not just within an error envelope
    val streamed = SparkEntry.queries("q_stream_dau_hll")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = SparkEntry.queries("q_events_dau_hll")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.nonEmpty)
  }
}
