package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata. */
case class MMRecord(doc_id: Long, data: Array[Byte], mime: String)

/** Features the (stubbed) decoder extracts per record. */
case class MMFeature(doc_id: Long, n_bytes: Long, checksum: Long,
                     head_byte: Long, width_stub: Long)

/** Output of the (stubbed) resize: new payload + before/after metadata. */
case class MMResized(doc_id: Long, orig_bytes: Long, resized_bytes: Long,
                     resized_checksum: Long)

/** One sampled "frame" of a (stubbed) video payload. */
case class MMFrame(doc_id: Long, frame_idx: Long, frame_bytes: Long,
                   frame_checksum: Long)

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

  private def records(s: SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"),
        lit("application/octet-stream").as("mime"))
      .as[MMRecord]
  }

  /** Stub "resize to half resolution": keep every 2nd byte. The real part
    * is the plumbing — a 1:1 binary→binary batch transform whose output is
    * a new payload column plus typed metadata, the exact shape an image
    * scaler (JNI/library per-partition init) plugs into. */
  private def mmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    records(s, dir).mapPartitions { it =>
      it.map { r =>
        val bytes = r.data
        val resized = new Array[Byte]((bytes.length + 1) / 2)
        var i = 0
        while (i < resized.length) { resized(i) = bytes(2 * i); i += 1 }
        var sum = 0L
        var j = 0
        while (j < resized.length) { sum += resized(j) & 0xff; j += 1 }
        MMResized(r.doc_id, bytes.length.toLong, resized.length.toLong,
          sum % 1000000007L)
      }
    }.toDF().orderBy("doc_id")
  }

  /** Stub "frame sampling": treat the payload as fixed-256-byte frames and
    * keep every 4th — the 1:N explode shape of real video frame extraction
    * (row per sampled frame, frame index + per-frame features). */
  private val FrameBytes = 64
  private val FrameStride = 2

  private def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    records(s, dir).flatMap { r =>
      val bytes = r.data
      val nFrames = (bytes.length + FrameBytes - 1) / FrameBytes
      (0 until nFrames by FrameStride).map { f =>
        val start = f * FrameBytes
        val end = math.min(start + FrameBytes, bytes.length)
        var sum = 0L
        var i = start
        while (i < end) { sum += bytes(i) & 0xff; i += 1 }
        MMFrame(r.doc_id, f.toLong, (end - start).toLong, sum % 1000000007L)
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  // ---- real image decode (PNG/BMP/JPEG via javax.imageio) ----------------
  // The gated mm_* keys stay byte-stubbed (a DuckDB oracle cannot decode
  // PNG); these paths are the REAL decoder plugged into the same
  // Dataset[MMRecord] → mapPartitions shape, spec-gated against
  // synthesized images. ImageIO ships with the JDK, needs no native init,
  // and decodes PNG/BMP deterministically (exact-pixel specs) plus JPEG —
  // the dominant crawled format — whose decode is lossy and not
  // bit-specified, so its specs are tolerance-based. Undecodable payloads
  // drop (flatMap), which also covers codec gaps.

  /** Real per-image features: dimensions + per-channel pixel sums in a
    * fixed raster order (exact integers — spec-checkable bit-for-bit). */
  case class MMImageFeature(doc_id: Long, width: Int, height: Int,
                            sum_r: Long, sum_g: Long, sum_b: Long)

  /** Real resize output: new PNG payload + before/after dimensions. */
  case class MMImageResized(doc_id: Long, orig_w: Int, orig_h: Int,
                            width: Int, height: Int, data: Array[Byte])

  private[graft] object ImageCodec {
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Half-resolution nearest-neighbor downsample: output pixel (x, y) =
      * input pixel (2x, 2y). Deterministic integer sampling — no
      * interpolation, no rounding modes to disagree on. */
    def resizeHalf(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
      val w = math.max(1, img.getWidth / 2)
      val h = math.max(1, img.getHeight / 2)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out.setRGB(x, y, img.getRGB(2 * x, 2 * y)); x += 1 }
        y += 1
      }
      out
    }
  }

  /** Decode each record's PNG/BMP payload and emit exact per-channel
    * sums — the real form of mmFeatures' stub. Undecodable payloads are
    * dropped (flatMap), the production posture for a crawled corpus. */
  private[graft] def imageFeatures(records: org.apache.spark.sql.Dataset[MMRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // ImageIO is JVM-static: nothing to init per partition, but the
      // plumbing point for a native decoder stays here
      it.flatMap { r =>
        ImageCodec.decode(r.data).map { img =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          MMImageFeature(r.doc_id, img.getWidth, img.getHeight, sr, sg, sb)
        }
      }
    }.toDF().orderBy("doc_id")
  }

  /** Real binary→binary image transform: decode, half-resolution
    * nearest-neighbor resize, re-encode PNG. Same 1:1 payload+metadata
    * shape as the mmResize stub. */
  private[graft] def imageResize(records: org.apache.spark.sql.Dataset[MMRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        ImageCodec.decode(r.data).map { img =>
          val small = ImageCodec.resizeHalf(img)
          MMImageResized(r.doc_id, img.getWidth, img.getHeight,
            small.getWidth, small.getHeight, ImageCodec.encodePng(small))
        }
      }
    }.toDF().orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures,
    "mm_resize" -> mmResize,
    "mm_frame_sample" -> mmFrameSample)

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
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
        |  CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS resized_bytes,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1, 2),
        |    i -> ascii(text[i:i]))) AS BIGINT) % 1000000007 AS resized_checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
         |f AS (SELECT doc_id, text, n,
         |  unnest(range(0, CAST(ceil(n / $FrameBytes.0) AS BIGINT), $FrameStride)) AS frame_idx
         |  FROM d)
         |SELECT doc_id, frame_idx,
         |  CAST(least(n - frame_idx * $FrameBytes, $FrameBytes) AS BIGINT) AS frame_bytes,
         |  CAST(list_sum(list_transform(
         |    range(frame_idx * $FrameBytes + 1, least(frame_idx * $FrameBytes + $FrameBytes, n) + 1),
         |    i -> ascii(text[i:i]))) AS BIGINT) % 1000000007 AS frame_checksum
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin)
}
