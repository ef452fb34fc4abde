package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print Bench's NORMALIZED physical plan for the named keys
  * twice in one session — a run-to-run diff isolates nondeterministic
  * plan-string content the fingerprint normalizer misses (SURVEY §8 r18
  * item 7: an unstable fingerprint must be fixed in the normalizer, not
  * trusted as a plan change).
  *
  *   sbt "runMain graft.PlanProbe q_stream_sessions mm_frame_sample"
  */
object PlanProbe {
  def normalize(raw: String): String = Bench.normalizePlan(raw)

  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq else Seq("q_stream_sessions", "mm_frame_sample")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (k <- keys; rep <- 1 to 2) {
      val df = SparkEntry.queries(k)(spark, sf)
      df.count()
      println(s"===== $k rep$rep =====")
      println(normalize(df.queryExecution.executedPlan.toString))
    }
    spark.stop()
  }
}
