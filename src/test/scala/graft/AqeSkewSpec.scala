package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling — the §4 claim "skew handled by AQE + salting"
  * exercised for real: an engineered hot key makes one shuffle partition
  * ~100× its siblings, and adaptive execution must SPLIT it
  * (OptimizeSkewedJoin) instead of letting a single task carry the whole
  * key. Thresholds are lowered to make the optimizer fire at test scale —
  * the plan shape under test is exactly what defaults produce at 100 TB
  * partition sizes. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // a broadcast join would dodge the shuffle under test
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // key 0 carries 100k fact rows; 9 other keys carry 1k each
      val fact = spark.range(0, 109000)
        .select(when(col("id") < 100000, 0L).otherwise(col("id") % 9 + 1).as("k"),
          col("id").as("v"))
      val dim = (0L to 9L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = fact.join(dim, "k")
      // collect() (not count()) so THIS DataFrame's adaptive plan is the
      // one that runs and finalizes — count() builds a separate execution
      assert(joined.collect().length === 109000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
