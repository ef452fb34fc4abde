package graft

import graft.operators.{MMRecord, Multimodal}

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Real-decoder multimodal tests: synthesized PNG/BMP images with exactly
  * known pixels through the Dataset[MMRecord] → mapPartitions plumbing.
  * Expected values are computed by independent arithmetic in the test,
  * never by calling the codec under test. */
class MultimodalSpec extends SparkSpec {

  /** w×h image with pixel (x, y) = rgb(x * 10 % 256, y * 10 % 256, (x + y) % 256). */
  private def synth(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 10 % 256) << 16) | ((y * 10 % 256) << 8) | ((x + y) % 256))
    img
  }

  private def bytes(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  /** Independent expected channel sums for synth(w, h). */
  private def expectedSums(w: Int, h: Int): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      sr += x * 10 % 256; sg += y * 10 % 256; sb += (x + y) % 256
    }
    (sr, sg, sb)
  }

  test("imageFeatures: exact dimensions + channel sums for PNG and BMP; garbage dropped") {
    import spark.implicits._
    val recs = Seq(
      MMRecord(1L, bytes(synth(8, 4), "png"), "image/png"),
      MMRecord(2L, bytes(synth(5, 7), "bmp"), "image/bmp"),
      MMRecord(3L, "not an image".getBytes("UTF-8"), "application/octet-stream"))
      .toDS()
    val rows = Multimodal.imageFeatures(recs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val (r1r, r1g, r1b) = expectedSums(8, 4)
    val (r2r, r2g, r2b) = expectedSums(5, 7)
    assert(rows.toSeq === Seq(
      (1L, 8, 4, r1r, r1g, r1b),
      (2L, 5, 7, r2r, r2g, r2b))) // doc 3 undecodable → dropped
  }

  test("imageResize: half-resolution nearest-neighbor, exact resampled pixels roundtrip") {
    import spark.implicits._
    val recs = Seq(MMRecord(7L, bytes(synth(8, 6), "png"), "image/png")).toDS()
    val row = Multimodal.imageResize(recs).collect().head
    assert((row.getLong(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4)) ===
      ((7L, 8, 6, 4, 3)))
    // decode the emitted PNG payload independently: output pixel (x, y)
    // must equal input pixel (2x, 2y) — PNG is lossless, so exact
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](5)))
    assert(out.getWidth === 4 && out.getHeight === 3)
    val src = synth(8, 6)
    for (y <- 0 until 3; x <- 0 until 4)
      assert((out.getRGB(x, y) & 0xffffff) === (src.getRGB(2 * x, 2 * y) & 0xffffff),
        s"pixel ($x, $y)")
  }

  test("imageFeatures: JPEG decodes with tolerance-bounded channel sums; mixed-codec batch") {
    // crawled image corpora are overwhelmingly JPEG; ImageIO decodes it in
    // the same path. JPEG is LOSSY and its decode is not bit-specified, so
    // expectations are tolerance-based: dimensions exact, per-channel MEAN
    // within ±4 of the source (a flat-gradient image keeps DCT error low)
    import spark.implicits._
    val recs = Seq(
      MMRecord(1L, bytes(synth(16, 12), "jpg"), "image/jpeg"),
      MMRecord(2L, bytes(synth(8, 4), "png"), "image/png"),
      MMRecord(3L, "still not an image".getBytes("UTF-8"), "application/octet-stream"))
      .toDS()
    val rows = Multimodal.imageFeatures(recs).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // garbage still dropped
    val jpeg = rows.head
    assert((jpeg.getInt(1), jpeg.getInt(2)) === ((16, 12)))
    val (er, eg, eb) = expectedSums(16, 12)
    val n = 16 * 12
    for (((got, exp), ch) <- Seq(jpeg.getLong(3) -> er, jpeg.getLong(4) -> eg,
        jpeg.getLong(5) -> eb).zip(Seq("r", "g", "b"))) {
      val meanErr = math.abs(got - exp).toDouble / n
      assert(meanErr <= 4.0, s"channel $ch mean decode error $meanErr > 4")
    }
    // the PNG row in the same batch stays bit-exact
    val (pr, pg, pb) = expectedSums(8, 4)
    assert((rows(1).getLong(3), rows(1).getLong(4), rows(1).getLong(5)) === ((pr, pg, pb)))
  }

  test("imageResize: JPEG in, PNG out — resampled pixels within decode tolerance") {
    import spark.implicits._
    val recs = Seq(MMRecord(9L, bytes(synth(16, 12), "jpg"), "image/jpeg")).toDS()
    val row = Multimodal.imageResize(recs).collect().head
    assert((row.getLong(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4)) ===
      ((9L, 16, 12, 8, 6)))
    // output payload is PNG (lossless re-encode), so the only error source
    // is the JPEG DECODE of the input: each resampled pixel must be within
    // a per-channel tolerance of the source pixel it samples
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](5)))
    val src = synth(16, 12)
    for (y <- 0 until 6; x <- 0 until 8; shift <- Seq(16, 8, 0)) {
      val got = (out.getRGB(x, y) >> shift) & 0xff
      val exp = (src.getRGB(2 * x, 2 * y) >> shift) & 0xff
      assert(math.abs(got - exp) <= 24, s"pixel ($x, $y) channel>>$shift: $got vs $exp")
    }
  }

  // ---- real audio decode -------------------------------------------------
  // PCM16 is exact integer data, so unlike JPEG every audio expectation is
  // bit-exact. Expected values computed by independent arithmetic; WAV
  // payloads synthesized through javax.sound's WRITER only (the decoder
  // under test never produces its own expectations).

  /** Hand-computed features of an interleaved PCM16 sample array. */
  private def expectedAudio(ch: Int, rate: Int, samples: Array[Short])
      : (Int, Int, Long, Long, Long, Long, Long) = {
    val frames = samples.length / ch
    val peak = samples.map(s => math.abs(s.toLong)).max
    val sumAbs = samples.map(s => math.abs(s.toLong)).sum
    val ch0 = (0 until frames).map(f => samples(f * ch))
    val zc = ch0.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
    (ch, rate, frames.toLong, frames.toLong * 1000L / rate, peak, sumAbs, zc.toLong)
  }

  test("audioFeatures: exact PCM16 stats for mono + stereo WAV; garbage dropped") {
    import spark.implicits._
    val mono = Array.tabulate(300)(i => ((i % 7) * 1000 - 3000).toShort)
    val stereo = Array.tabulate(400)(i =>
      (if (i % 2 == 0) (i / 2 % 5) * 2000 - 4000 else -8000 + i).toShort)
    val recs = Seq(
      MMRecord(1L, Multimodal.AudioCodec.encodeWav(8000, 1, mono), "audio/wav"),
      MMRecord(2L, Multimodal.AudioCodec.encodeWav(16000, 2, stereo), "audio/wav"),
      MMRecord(3L, "definitely not audio".getBytes("UTF-8"), "application/octet-stream"))
      .toDS()
    val rows = Multimodal.audioFeatures(recs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(rows.keySet === Set(1L, 2L)) // garbage dropped
    assert(rows(1L) === expectedAudio(1, 8000, mono))
    assert(rows(2L) === expectedAudio(2, 16000, stereo))
  }

  test("AudioCodec.decode is bounded on poisoned headers (r17 byte-23 hang regression)") {
    // deterministic repro of the r17 wedge: XOR byte 23 of any encodeWav
    // payload with 0x5a — the HIGH byte of the fmt-chunk channel count —
    // and the header declares 0x5a01 = 23041 channels; javax.sound's PCM
    // conversion stream then synthesizes output forever and the old
    // readAllBytes never returned (observed 39 CPU-minutes at 100% CPU).
    // Post-fix contract: None, promptly, at every truncation length.
    val wav = Multimodal.AudioCodec.encodeWav(8000, 1, Multimodal.synthAudioDedup(1L))
    val t0 = System.nanoTime()
    for (cut <- Seq(24, 44, 100, wav.length)) {
      val p = java.util.Arrays.copyOf(wav, cut)
      p(23) = (p(23) ^ 0x5a).toByte
      assert(Multimodal.AudioCodec.decode(p).isEmpty, s"poisoned header at cut=$cut must drop")
    }
    // an in-bounds-but-wrong LOW channel byte (3 channels over 1-channel
    // data) must also come back bounded — either a short decode or None,
    // never a wedge; and the pristine payload still decodes exactly
    Multimodal.AudioCodec.decode { val p = wav.clone(); p(22) = 3; p }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000.0, s"bounded decode took ${elapsedMs}ms — hang regression")
    val (rate, ch, samples) = Multimodal.AudioCodec.decode(wav).get
    assert(rate === 8000 && ch === 1 && samples.sameElements(Multimodal.synthAudioDedup(1L)))
  }

  test("ImageCodec.decode rejects decompression-bomb headers before raster allocation") {
    // PNG IHDR declares width at bytes 16..19, height at 20..23
    // (big-endian). Patch a valid PNG to declare 50000x50000: the old path
    // handed it to ImageIO.read which allocates the full 10 GB raster
    // before seeing any pixel data. Post-fix: the header peek rejects it
    // (over payload-proportional pixel cap) without the allocation.
    val png = Multimodal.synthImage(1L)
    val bomb = png.clone()
    def putBE(off: Int, v: Int): Unit = {
      bomb(off) = ((v >> 24) & 0xff).toByte; bomb(off + 1) = ((v >> 16) & 0xff).toByte
      bomb(off + 2) = ((v >> 8) & 0xff).toByte; bomb(off + 3) = (v & 0xff).toByte
    }
    putBE(16, 50000); putBE(20, 50000)
    val t0 = System.nanoTime()
    assert(Multimodal.ImageCodec.tryDecode(bomb).isEmpty)
    assert((System.nanoTime() - t0) / 1e6 < 5000.0)
    // pristine payload still decodes
    assert(Multimodal.ImageCodec.tryDecode(png).isDefined)
  }

  test("audioResample: 2x time decimation — decoded output frames == every other input frame") {
    import spark.implicits._
    val ch = 2
    val samples = Array.tabulate(500)(i => ((i * 13) % 9001 - 4500).toShort)
    val recs = Seq(
      MMRecord(5L, Multimodal.AudioCodec.encodeWav(8000, ch, samples), "audio/wav"))
      .toDS()
    val row = Multimodal.audioResample(recs).collect().head
    val frames = samples.length / ch
    val outFrames = (frames + 1) / 2
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getInt(3)) ===
      ((5L, frames.toLong, outFrames.toLong, 4000)))
    // decode the emitted WAV independently: PCM is lossless, so output
    // frame f must equal input frame 2f sample-for-sample on every channel
    val (rate, ch2, out) = Multimodal.AudioCodec.decode(row.getAs[Array[Byte]](4)).get
    assert(rate === 4000 && ch2 === ch && out.length === outFrames * ch)
    for (f <- 0 until outFrames; c <- 0 until ch)
      assert(out(f * ch + c) === samples(2 * f * ch + c), s"frame $f ch $c")
  }

  test("mm_audio_features: distributed encode+decode == driver-side reference; map-only plan") {
    val got = SparkEntry.queries("mm_audio_features")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val ids = Tables.t(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.size === ids.length)
    ids.foreach { id =>
      assert(got(id) === expectedAudio(1, 8000, Multimodal.synthSamples(id)), s"doc $id")
    }
    val plan = SparkEntry.queries("mm_audio_features")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), plan)
    assert("Exchange".r.findAllIn(plan).length <= 2,
      s"audio gate plan has unexpected shuffles:\n$plan")
  }

  test("decode plumbing stays a single distributed map stage (no shuffle before features)") {
    import spark.implicits._
    val recs = Seq(MMRecord(1L, bytes(synth(4, 4), "png"), "image/png")).toDS()
    val plan = Multimodal.imageFeatures(recs).queryExecution.executedPlan.toString
    // one SerializeFromObject/MapPartitions pipeline; the only exchange is
    // the final presentation orderBy
    assert(plan.contains("MapPartitions"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"unexpected shuffles in decode plan:\n$plan")
  }

  test("mm_image_dedup: dHash brightness invariance, local-edit near-dup, pattern-pure pairs") {
    def hashOf(id: Long): (Long, Long) =
      Multimodal.ImageCodec.decode(Multimodal.synthImage(id))
        .map(img => (Multimodal.dHash(img), Multimodal.dHashVertical(img)))
        .getOrElse(fail(s"decode failed for $id"))
    // uniform brightness shifts leave every gradient sign unchanged — in
    // BOTH directions of the 128-bit signature
    assert(hashOf(3L) === hashOf(53L))   // pattern 3, variants 0 vs 1
    assert(hashOf(3L) === hashOf(353L))  // variant 7
    // the local blob edit lands NEAR (re-encoded copy posture), not equal
    val (h3, v3) = hashOf(3L); val (h403, v403) = hashOf(403L)
    val blobDist = java.lang.Long.bitCount(h3 ^ h403) + java.lang.Long.bitCount(v3 ^ v403)
    assert(blobDist >= 1 && blobDist <= 6, s"blob hamming $blobDist")
    // both blob variants carry the identical edit
    assert(hashOf(403L) === hashOf(453L))

    val pairs = SparkEntry.queries("mm_image_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, hm) =>
      assert(a % 50 === b % 50, s"cross-pattern pair ($a, $b)")
      assert(hm >= 0 && hm <= 6)
    }
    // the 8 shift-variants of each pattern all pair at hamming 0
    val p0zero = pairs.filter(p => p._3 == 0L && p._1 % 50 == 0)
    assert(p0zero.length >= 28, s"pattern-0 zero-distance pairs: ${p0zero.length}")
  }

  test("mm_image_dedup banding: adversarial hamming-4..6 spreads are still paired (8-band pigeonhole)") {
    import spark.implicits._
    // base sig plus copies whose differing bits are SPREAD across as many
    // of the 8 bands as the budget allows, split over BOTH halves of the
    // 128-bit signature — exactly the pairs the r14 4×16 banding silently
    // dropped (no untouched quarter at hamming >= 4). With 8 16-bit bands
    // (byte b of each half), hamming <= 7 always leaves an untouched band.
    val baseH = 0x5A5A5A5A5A5A5A5AL
    val baseV = 0xA5A5A5A5A5A5A5A5L
    val sigs = Seq(
      // (doc_id, sig_h, sig_v)
      (1L, baseH, baseV),
      (2L, baseH ^ 0x0000000001010101L, baseV),              // h=4: bands 0-3 touched via H
      (3L, baseH ^ 0x0000000001010101L,                      // h=6: bands 0-3 via H,
        baseV ^ 0x0101000000000000L),                        //      bands 6-7 via V
      (4L, baseH ^ 0x0101010101010101L, baseV)               // h=8: beyond max, must NOT pair
    ).toDF("doc_id", "sig_h", "sig_v")
    val got = operators.Multimodal.hashPairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"hamming-4 spread pair missing: $got")
    assert(got.contains((1L, 3L)), s"hamming-6 spread pair missing: $got")
    assert(!got.contains((1L, 4L)), s"hamming-8 pair must be filtered: $got")
  }

  test("mm_video_frames: decoded pixels == generator math exactly; frame/container drop postures") {
    val M = 1000000007L
    val rows = SparkEntry.queries("mm_video_frames")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.nonEmpty)
    val ids = Tables.t(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // per-frame EXACT expectation, computed from the generator formula
    // alone (PNG is lossless, so the decode path must reproduce it)
    def expectedChecksum(id: Long, f: Int): Long = {
      val pattern = (id % 50).toInt
      val variant = ((id / 50) % 10).toInt
      var sum = 0L
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          sum += operators.Multimodal.synthFramePixel(pattern, variant, f, x, y)
          x += 1
        }
        y += 1
      }
      sum % M
    }
    ids.foreach { id =>
      val sampled = Seq(0, 2, 4)
      if (id % 101 == 0) {
        // corrupt container -> whole doc dropped
        sampled.foreach(f => assert(!rows.contains((id, f.toLong)), s"doc $id should be dropped"))
      } else {
        val expectFrames = if (id % 97 == 0) Seq(0, 4) else sampled // frame 2 corrupt -> dropped
        sampled.foreach { f =>
          if (expectFrames.contains(f)) {
            val (w, h, sum, _) = rows((id, f.toLong))
            assert((w, h) === ((32L, 32L)))
            assert(sum === expectedChecksum(id, f), s"doc $id frame $f pixel checksum")
          } else assert(!rows.contains((id, f.toLong)), s"doc $id frame $f should be dropped")
        }
      }
    }
    // temporal coherence: the per-frame brightness ramp is uniform, so the
    // perceptual dHash is IDENTICAL across a doc's frames (the property a
    // video near-dup stage keys on)
    rows.keys.map(_._1).toSeq.distinct.foreach { id =>
      val hashes = rows.collect { case ((d, _), (_, _, _, dh)) if d == id => dh }.toSet
      assert(hashes.size === 1, s"doc $id frames diverge in dHash")
    }
  }

  test("mm_video_dedup: re-graded copies pair at full coverage; corrupt-frame docs still pair; patterns stay pure") {
    val pairs = SparkEntry.queries("mm_video_dedup")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(pairs.nonEmpty)
    // same pattern only (the per-video shift is uniform, so every aligned
    // frame pair of two same-pattern videos is at hamming 0)
    pairs.keys.foreach { case (a, b) =>
      assert(a % 50 === b % 50, s"cross-pattern video pair ($a, $b)")
      assert(a < b)
    }
    val ids = Tables.t(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // corrupt CONTAINERS never appear on either side
    pairs.keys.foreach { case (a, b) =>
      assert(a % 101 != 0L && b % 101 != 0L, s"corrupt container in pair ($a, $b)")
    }
    // every clean same-pattern pair IS found, at full coverage of the
    // shorter side — including pairs where one side lost a corrupt frame
    // (2 decodable sampled frames instead of 3: ratio-of-min still 1.0)
    val clean = ids.filter(_ % 101 != 0L)
    for (a <- clean; b <- clean if a < b && a % 50 == b % 50) {
      val p = pairs.get((a, b))
      assert(p.isDefined, s"missing same-pattern pair ($a, $b)")
      val (nMatched, ratio) = p.get
      assert(ratio === 1.0, s"pair ($a, $b) ratio $ratio")
      val expectFrames = math.min(if (a % 97 == 0) 2 else 3, if (b % 97 == 0) 2 else 3)
      assert(nMatched === expectFrames.toLong, s"pair ($a, $b) matched $nMatched")
    }
  }

  test("q_stream_image_dedup: incremental over micro-batches == batch pairs; crash replay is a per-table no-op") {
    val keysT = java.nio.file.Files.createTempDirectory("graft-simg-k-").toString + "/t"
    val sigsT = java.nio.file.Files.createTempDirectory("graft-simg-s-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-simg-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-simg-ck-").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-simg-d-").toString + "/t"
    def run() = graft.operators.StreamingOps
      .streamImageDedupAt(spark, sf, keysT, sigsT,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = run()
    // the corpus arrives over 4 micro-batches, so cross-batch pairs can
    // only come from the accumulated band-key + signature stores —
    // equality with the single-shot batch key proves the incremental path
    val batch = SparkEntry.queries("mm_image_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // crash replay: drop the last checkpoint commit marker — all three
    // bid guards must make the replayed batch a no-op
    def stateRows = (spark.read.format("lance").load(keysT).count(),
      spark.read.format("lance").load(sigsT).count(),
      spark.read.format("lance").load(dst).count())
    val before = stateRows
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    val replayed = run()
    assert(stateRows === before, s"replay re-appended state: $before -> $stateRows")
    assert(replayed === streamed, "answer moved under replay")
  }

  test("q_stream_image_dedup: over-cap bucket — overflow batch dropped, earlier pairs kept") {
    import spark.implicits._
    // 300 byte-identical images (> ImgBucketCap = 256) over 4 micro-batches:
    // while the accumulated bucket stays under cap, cross-batch pairs emit;
    // the batch that tips it over is dropped from that bucket. The
    // single-shot BATCH path drops the whole bucket (zero pairs) — the
    // streamed answer is its recall-safe superset, never its subset.
    val png = operators.Multimodal.synthImage(7L)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-simg-cap-src-").toString
    (1L to 300L).map(id => (id, png)).toDF("doc_id", "image")
      .repartition(4).write.mode("overwrite").parquet(srcDir)
    val keysT = java.nio.file.Files.createTempDirectory("graft-simg-cap-k-").toString + "/t"
    val sigsT = java.nio.file.Files.createTempDirectory("graft-simg-cap-s-").toString + "/t"
    val streamed = graft.operators.StreamingOps
      .streamImageDedupAt(spark, sf, keysT, sigsT, srcDir0 = srcDir)
      .collect()
    assert(streamed.nonEmpty, "pairs from under-cap batches must be kept")
    assert(streamed.length < 300 * 299 / 2,
      s"the over-cap batch must be dropped from the bucket: ${streamed.length}")
    // the batch path's capped_sorted_list NULLs the whole 300-wide bucket
    val sigs = operators.Multimodal.decodeSigs(spark,
      (1L to 300L).map(id => (id, png)).toDF("doc_id", "image")).localCheckpoint()
    assert(operators.Multimodal.hashPairs(sigs).count() === 0L,
      "single-shot batch must drop the whole over-cap bucket")
  }

  test("mm_audio_dedup: gain-invariant fingerprint — re-gained copies pair, patterns stay pure, local edit lands near") {
    // kernel invariance: scaling every sample preserves every window
    // comparison EXACTLY (integer cross-multiplication, no rounding)
    val base = operators.Multimodal.synthAudioDedup(3L) // pattern 3, gain 1
    val gained = base.map(s => (s * 5).toShort)
    assert(operators.Multimodal.audioFingerprint(base) ===
      operators.Multimodal.audioFingerprint(gained))
    // a small local edit (drop 30 samples to silence) flips at most the
    // few windows it touches — near, not identical-or-far
    val edited = base.clone()
    var i = 500; while (i < 530) { edited(i) = 0; i += 1 }
    val (h1, v1) = operators.Multimodal.audioFingerprint(base)
    val (h2, v2) = operators.Multimodal.audioFingerprint(edited)
    val ham = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(v1 ^ v2)
    assert(ham <= 6, s"local edit moved $ham bits — fingerprint too brittle")
    // distinct patterns are far apart (no spurious cross-pattern pairing)
    val other = operators.Multimodal.synthAudioDedup(4L)
    val (h3, v3) = operators.Multimodal.audioFingerprint(other)
    assert(java.lang.Long.bitCount(h1 ^ h3) + java.lang.Long.bitCount(v1 ^ v3) > 6)

    // gated key on sf0.001: 50 patterns × 10 gain variants — every
    // within-pattern pair at hamming 0, zero cross-pattern pairs
    val rows = SparkEntry.queries("mm_audio_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 50 * (10 * 9) / 2, s"expected 2250 pairs, got ${rows.length}")
    assert(rows.forall { case (a, b, _) => a % 50 == b % 50 },
      "cross-pattern pair — fingerprint collision across envelopes")
    assert(rows.forall(_._3 === 0L), "re-gained copies must match exactly")
  }

  test("mm_video_dedup_shingle == mm_video_dedup row-for-row on the aligned fixture") {
    // every near-dup in the gated fixture is offset-0 (re-grades, no
    // trims), where the shingle path's best-offset verify must reproduce
    // the positional answer exactly — same pairs, same matched counts,
    // same ratios. The trim recovery the key exists for is spec'd on the
    // synthetic shifted-clip fixture in the alignment test below.
    val pos = SparkEntry.queries("mm_video_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val sh = SparkEntry.queries("mm_video_dedup_shingle")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(sh === pos)
  }

  test("mm_audio_dedup_trim: window-aligned trims pair via shingles; the length-relative fingerprint provably misses them") {
    val base = operators.Multimodal.synthAudioTrim(3L)    // pattern 3: gain 1, trim 0
    val trimmed = operators.Multimodal.synthAudioTrim(403L) // pattern 3: gain 1, trim 4 windows
    // kernel: the trimmed clip's shingle set is a SUBSET of the base's
    // (exact window alignment), so Jaccard degrades linearly with trim
    val sb = operators.Multimodal.audioSignShingles(base).toSet
    val st = operators.Multimodal.audioSignShingles(trimmed).toSet
    assert(st.subsetOf(sb), "trimmed shingles must be a subset of the base's")
    val jac = (sb & st).size.toDouble / (sb | st).size
    assert(jac >= operators.Multimodal.AudioTrimTau, s"trim-4 jaccard $jac below tau")
    // negative control — WHY this key exists: the length-relative
    // fingerprint re-windows each clip over its own length, so a trim
    // shifts every boundary and the signatures land far apart
    val (h1, v1) = operators.Multimodal.audioFingerprint(base)
    val (h2, v2) = operators.Multimodal.audioFingerprint(trimmed)
    val ham = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(v1 ^ v2)
    assert(ham > operators.Multimodal.ImgHammingMax,
      s"length-relative fingerprint unexpectedly survives the trim (hamming $ham)")
    // gated key: every within-pattern (gain x trim) pair, nothing else
    val rows = SparkEntry.queries("mm_audio_dedup_trim")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 50 * (10 * 9) / 2, s"expected 2250 pairs, got ${rows.length}")
    assert(rows.forall { case (a, b, _) => a % 50 == b % 50 }, "cross-pattern pair")
    assert(rows.forall(_._3 >= operators.Multimodal.AudioTrimTau))
  }

  test("q_stream_audio_dedup: streamed pairs == batch mm_audio_dedup row-for-row") {
    // the audio twin rides the SAME nearDedupBatch body as the image and
    // text twins (guards, bucket-cover probes, ordered appends all
    // shared) — only the decode differs, so streamed==batch is the whole
    // correctness statement
    val streamed = SparkEntry.queries("q_stream_audio_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = SparkEntry.queries("mm_audio_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed === batch)
  }

  test("q_stream_video_dedup: streamed pairs == batch mm_video_dedup row-for-row") {
    // the video twin rides nearDedupBatch directly (per-frame state can't
    // go through streamSigDedupAt's one-row-per-doc shape): the frame
    // position folds into the band key (frame_idx*2^16 + band — the
    // positional bucket), the state keeps one row per sampled frame, and
    // the verify tail is the batch operator's videoVerifyPairs verbatim —
    // so streamed==batch is the whole correctness statement, same as the
    // other four twins
    val streamed = SparkEntry.queries("q_stream_video_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val batch = SparkEntry.queries("mm_video_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "no video pairs at this sf — vacuous equality")
  }

  test("q_stream_video_dedup: a clip arriving AFTER its source pairs cross-batch through the positional key probe") {
    import spark.implicits._
    // engineered 2-batch stream: batch 0 carries the source clips, batch 1
    // carries a re-encode (same sigs, same positions) + an unrelated clip;
    // the pair must be discovered in the LATER member's batch via the
    // history probe — the cross-batch path the sf corpus may or may not
    // exercise depending on file split order
    val keysT = java.nio.file.Files.createTempDirectory("svid-x-k-").toString + "/t"
    val framesT = java.nio.file.Files.createTempDirectory("svid-x-f-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("svid-x-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("svid-x-ck-").toString
    val dst = java.nio.file.Files.createTempDirectory("svid-x-d-").toString + "/t"
    // real GVID payloads through the real decoder: synthVideo(id) is
    // deterministic per id, so two docs built from the SAME id have
    // identical frames (the re-encode posture at hamming 0)
    def payload(docId: Long, contentId: Long) =
      (docId, operators.Multimodal.synthVideo(contentId))
    Seq(payload(10L, 1L)).toDF("doc_id", "video")
      .coalesce(1).write.mode("append").parquet(srcDir)
    operators.StreamingOps.streamVideoDedupAt(spark, sf, keysT, framesT,
      srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
    Seq(payload(20L, 1L), payload(30L, 2L)).toDF("doc_id", "video")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val got = operators.StreamingOps.streamVideoDedupAt(spark, sf, keysT, framesT,
      srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got === Seq((10L, 20L, 1.0)),
      s"cross-batch video pair wrong: $got")
  }

  test("videoPairs == brute-force positional verify on randomized frame tables (seeded, 12 corpora)") {
    import spark.implicits._
    // the fixture specs pin engineered cases; this pins the GENERAL
    // contract on randomized signature tables: for every doc pair,
    // n_matched = aligned frames within ImgHammingMax (exact 128-bit
    // hamming) and match_ratio = n_matched / min(nf) at 6 dp, kept at
    // >= 0.5 — banding must surface EVERY such pair (pigeonhole: a
    // matched frame has <= 6 flips over 8 disjoint 16-bit bands, so one
    // band agrees exactly). Deterministic seeds — no flaky CI.
    val rnd = new scala.util.Random(20260815L)
    val bases = Array(0L, -1L, 0x5555555555555555L, 0x123456789abcdefL)
    for (iter <- 1 to 12) {
      val nDocs = 2 + rnd.nextInt(4)
      val frames = (1 to nDocs).flatMap { d =>
        val nf = 1 + rnd.nextInt(5)
        (0 until nf).map { f =>
          // near-dup structure: perturb a base by 0..8 random bit flips
          // split across both halves
          var h = bases(rnd.nextInt(bases.length))
          var v = bases(rnd.nextInt(bases.length))
          (0 until rnd.nextInt(9)).foreach { _ =>
            if (rnd.nextBoolean()) h ^= 1L << rnd.nextInt(64)
            else v ^= 1L << rnd.nextInt(64)
          }
          (d.toLong, f.toLong, h, v)
        }
      }
      val got = operators.Multimodal.videoPairs(
        frames.toDF("doc_id", "frame_idx", "sig_h", "sig_v"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      // brute force in plain Scala
      val byDoc = frames.groupBy(_._1)
      val expected = (for {
        a <- byDoc.keys.toSeq; b <- byDoc.keys.toSeq if a < b
      } yield {
        val fa = byDoc(a).map(r => r._2 -> ((r._3, r._4))).toMap
        val fb = byDoc(b).map(r => r._2 -> ((r._3, r._4))).toMap
        val matched = fa.keySet.intersect(fb.keySet).count { f =>
          val ((ha, va), (hb, vb)) = (fa(f), fb(f))
          java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(va ^ vb) <=
            operators.Multimodal.ImgHammingMax
        }
        val ratio = BigDecimal(matched.toDouble / math.min(fa.size, fb.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        ((a, b), (matched.toLong, ratio))
      }).filter { case (_, (_, ratio)) => ratio >= operators.Multimodal.VideoMatchRatio }
        .toMap
      assert(got === expected, s"iter $iter: got=$got expected=$expected frames=$frames")
    }
  }

  test("mm_video_dedup alignment: matches count per aligned frame position, ratio over the shorter side") {
    import spark.implicits._
    // doc 1: frames 0,2,4 with distinct sigs; doc 2: same sigs at the same
    // positions (full match); doc 3: same sigs but SHIFTED one position
    // (trimmed-clip posture — positional alignment must NOT pair it);
    // doc 4: only frames 0,2 matching doc 1 (shorter side ratio = 1.0)
    val s0 = 0x1111111111111111L; val s2 = 0x2222222222222222L; val s4 = 0x4444444444444444L
    val frames = Seq(
      (1L, 0L, s0, s0), (1L, 2L, s2, s2), (1L, 4L, s4, s4),
      (2L, 0L, s0, s0), (2L, 2L, s2, s2), (2L, 4L, s4, s4),
      (3L, 0L, s2, s2), (3L, 2L, s4, s4), (3L, 4L, s0, s0),
      (4L, 0L, s0, s0), (4L, 2L, s2, s2)
    ).toDF("doc_id", "frame_idx", "sig_h", "sig_v")
    val got = operators.Multimodal.videoPairs(frames).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.get((1L, 2L)).contains((3L, 1.0)), s"full aligned match missing: $got")
    assert(!got.contains((1L, 3L)), s"shifted clip must not pair positionally: $got")
    assert(got.get((1L, 4L)).contains((2L, 1.0)), s"shorter-side ratio pair missing: $got")

    // the SHINGLED path recovers exactly the pair positional alignment
    // cannot: doc 3 is doc 1 shifted one sampled position (a trim), its
    // s2→s4 run shares a 2-frame shingle with doc 1's, and the best-offset
    // verify (off = +2) matches 2 of 3 frames — ratio 2/3 ≥ 0.5
    val sh = operators.Multimodal.videoPairsShingled(frames).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(sh.get((1L, 3L)).contains((2L, 0.666667)),
      s"shingle path must recover the trimmed clip: $sh")
    // offset 0 reproduces the positional answers for aligned pairs
    assert(sh.get((1L, 2L)).contains((3L, 1.0)), s"aligned pair lost by shingling: $sh")
    assert(sh.get((1L, 4L)).contains((2L, 1.0)), s"shorter-side pair lost by shingling: $sh")

    // the verify ROUTE is a cost decision, not a semantic one (r17): the
    // fixture's tiny pairs take the per-pair cross product by default —
    // forcing every pair through the band-keyed join (crossCap = 0) must
    // produce the identical answer
    val shBand = operators.Multimodal.videoPairsShingled(frames, crossCap = 0L)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(shBand === sh, "band-only verify diverged from the adaptive route")
  }

  test("shingled verify fan-in is band-bounded: a 512-frame shifted clip verifies in o(nf^2) rows") {
    import spark.implicits._
    // the long-video shape the r16 verdict flagged: pre-r17 the verify
    // joined the full frame cross product per candidate pair (nf^2 =
    // 262144 hamming rows here); the band-keyed join must surface the
    // same best-offset answer from collision-bounded rows (matched
    // frames + ~birthday noise at 16 bits/band)
    val nf = 512; val off = 7
    val rnd = new scala.util.Random(17L)
    val sigs = Array.fill(nf)((rnd.nextLong(), rnd.nextLong()))
    val src = (0 until nf).map(i => (1L, i.toLong, sigs(i)._1, sigs(i)._2))
    val clip = (0 until nf - off).map(i =>
      (2L, i.toLong, sigs(i + off)._1, sigs(i + off)._2))
    val frames = (src ++ clip)
      .toDF("doc_id", "frame_idx", "sig_h", "sig_v").localCheckpoint()
    val got = operators.Multimodal.videoPairsShingled(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq((1L, 2L, (nf - off).toLong, 1.0)),
      s"trimmed 512-frame clip must pair at full shorter-side ratio: $got")
    val cand = Seq((1L, 2L)).toDF("a_id", "b_id")
    // count the SCANNED set (band collisions before the hamming filter):
    // the filtered output is plan-independent, so only the collision
    // count distinguishes the band join from an nf² cross-product revert
    val scanned = operators.Multimodal.bandCollisionRows(cand,
      operators.Multimodal.imgBandKeys(frames,
        carry = Seq("doc_id", "frame_idx", "sig_h", "sig_v"))).count()
    assert(scanned < 16L * nf,
      s"verify fan-in $scanned scanned rows — not o(nf^2) (nf^2 = ${nf.toLong * nf})")
    val matched = operators.Multimodal.shingleVerifyPairs(cand, frames).count()
    assert(matched === (nf - off).toLong,
      s"matched pairs: expected ${nf - off}, got $matched")
  }
}
