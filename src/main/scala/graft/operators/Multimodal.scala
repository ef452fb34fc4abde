package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata. */
case class MMRecord(doc_id: Long, data: Array[Byte], mime: String)

/** Features the (stubbed) decoder extracts per record. */
case class MMFeature(doc_id: Long, n_bytes: Long, checksum: Long,
                     head_byte: Long, width_stub: Long)

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata and run a per-partition batch
  * decode/feature-extract.
  *
  * The decode step is a STUB (image/audio libs are not in this container):
  * it computes deterministic byte-level features standing in for a real
  * decoder. Everything around it is the real Spark shape — a typed
  * `Dataset[MMRecord]`, `mapPartitions` batch processing (one decoder init
  * per partition, the same shape a JNI/FFmpeg decode would need), and a
  * columnar schema out. At 100 TB this is a single map stage; partition
  * sizing is inherited from the parquet scan.
  */
object Multimodal extends QueryModule {
  import Tables._

  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val records = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"),
        lit("application/octet-stream").as("mime"))
      .as[MMRecord]
    records.mapPartitions { it =>
      // one "decoder" init per partition would go here
      it.map { r =>
        val bytes = r.data
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        MMFeature(r.doc_id, bytes.length.toLong, sum % 1000000007L,
          if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else -1L,
          (bytes.length % 64).toLong)
      }
    }.toDF().orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures)

  /** The corpus is ASCII, so byte-level features are expressible over char
    * codes in the oracle. */
  val oracleSql: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1),
        |    i -> ascii(text[i:i]))) AS BIGINT) % 1000000007 AS checksum,
        |  CAST(ascii(text[1:1]) AS BIGINT) AS head_byte,
        |  CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width_stub
        |FROM documents ORDER BY doc_id""".stripMargin)
}
