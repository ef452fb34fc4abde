package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Structured-Streaming pipelines over the lance connector (§G additions):
  * the reference is a Flink connector, so stream-in/stream-out parity is
  * first-class — source tailing (LanceMicroBatchStream), exactly-once sink
  * commits, and event-time windowed aggregation with a watermark.
  *
  * Both keys drain with Trigger.AvailableNow and reduce to results a batch
  * DuckDB oracle reproduces — streaming vs batch equivalence IS the
  * correctness statement.
  */
object StreamingOps extends QueryModule {
  import Tables._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(s"graft-$prefix-").toString

  /** lance → filter/project → lance: the full source→sink path. The sink
    * commit is the manifest-txn exactly-once path; the source enumerates
    * fragment deltas per micro-batch (no re-reads, no duplicates). */
  private def streamPipeline(s: SparkSession, dir: String): DataFrame = {
    val src = tmp("spipe-src"); val dst = tmp("spipe-dst"); val ckpt = tmp("spipe-ckpt")
    t(s, dir, "orders").write.format("lance").option("maxRowsPerFile", "5000").save(src)
    val q = s.readStream.format("lance").load(src)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_custkey", "o_orderpriority")
      .writeStream.format("lance")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    s.read.format("lance").load(dst)
      .agg(count(lit(1)).as("n"), sum("o_orderkey").cast("long").as("sum_key"))
  }

  /** Event-time tumbling window with a watermark, drained deterministically:
    * append-mode windowed aggs only emit windows the watermark has passed,
    * so a sentinel event one day past the real maximum pushes the final
    * watermark beyond every real window (the trailing no-data micro-batch
    * then flushes them all); the sentinel's own window stays pending and is
    * filtered out. Result = exactly the batch per-hour counts. */
  private def streamWindow(s: SparkSession, dir: String): DataFrame = {
    val srcDir = tmp("swin-src"); val dst = tmp("swin-dst"); val ckpt = tmp("swin-ckpt")
    val ev = t(s, dir, "events").select(col("ts"), col("value"))
    val maxTs = ev.agg(max("ts")).first().getTimestamp(0)
    ev.coalesce(1).write.mode("overwrite").parquet(srcDir)
    import s.implicits._
    Seq(Tuple2(new java.sql.Timestamp(maxTs.getTime + 86400L * 1000), 0.0))
      .toDF("ts", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q = s.readStream.schema(ev.schema).parquet(srcDir)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
      .writeStream.format("lance")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    s.read.format("lance").load(dst)
      .filter(col("w_start") <= lit(maxTs)) // drop the sentinel's window if emitted
      .orderBy("w_start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lance_stream_pipeline" -> streamPipeline,
    "q_stream_window" -> streamWindow)

  val oracleSql: Map[String, String] = Map(
    "lance_stream_pipeline" ->
      """SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin,
    "q_stream_window" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin)
}
