package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Optimization-round deliverable helper: write `.explain("formatted")`
  * output for the named declared keys to OUTDIR/<key>_<tag>.txt
  * (guide §1: capture the plan shape — Exchange count, join strategy,
  * PushedFilters/ReadSchema, WholeStageCodegen spans — before and after
  * each change).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  *     sbt "runMain graft.ExplainDump plans/r20 before q_stream_semantic knn_join"
  *
  * Streaming keys execute their pipeline while building the returned
  * DataFrame; the dump captures the final (sink-read) side's plan — the
  * same frame the bench fingerprints. Diagnostic only.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump OUTDIR TAG key [key ...]")
    val outDir = args(0); val tag = args(1); val keys = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      df.count() // execute (warms codegen; streaming keys ran their pipeline building df)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${k}_$tag.txt"), formatted)
      println(s"[explain] wrote $outDir/${k}_$tag.txt (${formatted.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
