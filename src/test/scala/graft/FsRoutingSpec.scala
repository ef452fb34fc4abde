package graft

import org.apache.spark.sql.functions._

/** A local filesystem masquerading under a non-`file` scheme. Every byte
  * still lands on local disk, but NOTHING about the path is visible to
  * `java.io.File` — exactly the property of an object-store warehouse
  * (s3a://, gs://, abfs://). Any state/metadata check that bypasses the
  * Hadoop FileSystem API silently reads "absent" for these paths, which
  * is the failure mode the FS-routing specs below pin down. */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}

/** [[MockFs]] that COUNTS every FileSystem round trip by kind — the
  * object-store cost model, where request latency × op count (not local
  * bytes) is what a micro-batch pays. Only TOP-LEVEL calls count:
  * RawLocalFileSystem internally re-enters getFileStatus from open /
  * listStatus / create (a real object store pays one GET or LIST there),
  * so nested calls are suppressed via a per-thread depth guard. Counters
  * are static: Hadoop caches one FS instance per scheme and local-mode
  * executors share the JVM. */
class CountingMockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  import CountingMockFs.counted
  override def getScheme: String = "countfs"
  override def getUri: java.net.URI = java.net.URI.create("countfs:///")
  override def getFileStatus(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus =
    counted("getFileStatus", f)(super.getFileStatus(f))
  override def listStatus(f: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
    counted("listStatus", f)(super.listStatus(f))
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
    counted("open", f)(super.open(f, bufferSize))
  // ALL RawLocalFileSystem create/append variants funnel through this
  // protected hook — counting any single public `create` overload misses
  // the writer paths that call a sibling variant directly
  override protected def createOutputStreamWithMode(f: org.apache.hadoop.fs.Path,
      append: Boolean,
      permission: org.apache.hadoop.fs.permission.FsPermission): java.io.OutputStream =
    counted("create", f)(super.createOutputStreamWithMode(f, append, permission))
  override def delete(f: org.apache.hadoop.fs.Path, recursive: Boolean): Boolean =
    counted("delete", f)(super.delete(f, recursive))
  override def rename(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Boolean =
    counted("rename", src)(super.rename(src, dst))
  override def mkdirs(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission): Boolean =
    counted("mkdirs", f)(super.mkdirs(f, permission))
}

object CountingMockFs {
  import java.util.concurrent.atomic.AtomicLong
  private val ops = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
  // per-(op, table-root) counts — the adjudication view: WHICH table's ops
  // grew decides "probe growth with history" vs "commit-side growth"
  private val byRoot = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
  private val depth = ThreadLocal.withInitial[Integer](() => 0)
  private def rootOf(p: org.apache.hadoop.fs.Path): String = {
    val segs = Option(p).map(_.toUri.getPath).getOrElse("?").split("/").filter(_.nonEmpty)
    // temp roots look like /tmp/graft-cfs-k-12345/t — key on the named segment
    segs.find(_.matches(".*[a-z]-\\d+$")).orElse(segs.headOption)
      .getOrElse("?").replaceAll("-\\d+$", "")
  }
  private[graft] def counted[A](k: String, p: org.apache.hadoop.fs.Path)(body: => A): A = {
    val d = depth.get()
    if (d == 0) {
      ops.computeIfAbsent(k, _ => new AtomicLong).incrementAndGet()
      byRoot.computeIfAbsent(s"$k@${rootOf(p)}", _ => new AtomicLong).incrementAndGet()
    }
    depth.set(d + 1)
    try body finally depth.set(d)
  }
  def reset(): Unit = { ops.clear(); byRoot.clear() }
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    ops.asScala.map { case (k, v) => k -> v.get }.toMap
  }
  def snapshotByRoot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    byRoot.asScala.map { case (k, v) => k -> v.get }.toMap
  }
  def total: Long = snapshot.values.sum
}

/** The streaming replay guards and the text index's standing-index
  * metadata must route ALL existence/high-water/version-pin IO through
  * the path's Hadoop FileSystem — a raw `java.io.File` check is always
  * false on an object-store warehouse, so the per-table idempotence
  * guards would silently disarm (every replayed batch re-appends) and
  * `CALL system.search` would rebuild its index on every call. These
  * specs run a streaming state root and a text-index root through a
  * non-`file` scheme and prove the guards still hold. */
class FsRoutingSpec extends SparkSpec {
  private def registerMockFs(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)

  private def mockRoot(prefix: String): String =
    "mockfs://" + java.nio.file.Files.createTempDirectory(prefix).toString

  test("streaming dedup state on a non-file scheme: guards armed, crash replay is a no-op") {
    registerMockFs()
    import spark.implicits._
    val state = mockRoot("graft-mockfs-sded-") + "/t"
    val docs = (1L to 60L).map(i => (i, s"mockfs text ${i % 12} body")).toDF("doc_id", "text")
    val srcDir = java.nio.file.Files.createTempDirectory("graft-mockfs-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mockfs-ck-").toString
    def run() = graft.operators.StreamingOps
      .streamDedupAt(spark, docs, state, srcParts = 4, srcDir0 = srcDir, ckpt0 = ckpt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    // negative control — the check the guards USED to make: java.io.File
    // cannot see this root at all, while the FS-routed probes can
    assert(!new java.io.File(state).exists(),
      "mock scheme unexpectedly visible to java.io.File — control invalid")
    assert(graft.operators.StreamingOps.tableExists(spark, state))
    assert(graft.operators.StreamingOps.lastBidOf(spark, state, colName = "gen") >= 0L)
    val stateRows = spark.read.format("lance").load(state).count()
    assert(stateRows > 0L)
    // crash between the state append and the checkpoint commit: drop the
    // last commit marker and re-run — the replayed batch's bid <= max(gen)
    // already in the (mockfs) state table, so the append must no-op
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
    assert(replayed === first)
    assert(spark.read.format("lance").load(state).count() === stateRows,
      "replayed micro-batch re-appended its generation — guard disarmed off local FS")
  }

  test("full connector lifecycle on a non-file scheme: write, scan, DML, time travel, compaction") {
    registerMockFs()
    import spark.implicits._
    val root = mockRoot("graft-mockfs-life-") + "/t"
    // write (two versions), scan with pushdown
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)).toDF("id", "k", "v")
      .write.format("lance").save(root)
    Seq((4L, "b", 40L)).toDF("id", "k", "v")
      .write.format("lance").mode("append").save(root)
    val ds = spark.read.format("lance").load(root)
    assert(ds.count() === 4)
    assert(ds.filter($"v" > 25L).select("id").collect().map(_.getLong(0)).toSet
      === Set(3L, 4L))
    // row-level DELETE (DV sidecars land on the mock scheme)
    graft.sources.lance.LanceDelete.deleteWhere(spark, root,
      Array(org.apache.spark.sql.sources.EqualTo("id", 2L)), Map.empty)
    assert(spark.read.format("lance").load(root).count() === 3)
    // atomic keyed upsert
    graft.sources.lance.LanceDelete.replaceWhere(spark, root,
      Seq((5L, "a", 50L)).toDF("id", "k", "v"),
      Array(org.apache.spark.sql.sources.EqualTo("k", "a")))
    assert(spark.read.format("lance").load(root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === Set((5L, "a", 50L), (4L, "b", 40L)))
    // time travel back across all of it
    assert(spark.read.format("lance").option("versionAsOf", "1").load(root).count() === 3)
    assert(spark.read.format("lance").option("versionAsOf", "2").load(root).count() === 4)
    // compaction rewrites fragments through the mock FS and keeps the answer
    graft.sources.lance.LanceMaintenance.compact(spark, root,
      smallerThanRows = 1000000L, targetRows = 1000000L)
    assert(spark.read.format("lance").load(root)
      .collect().map(_.getLong(0)).toSet === Set(5L, 4L))
  }

  test("streaming pipeline with source, sink AND checkpoint on a non-file scheme") {
    registerMockFs()
    import spark.implicits._
    // the production object-store footgun is the CHECKPOINT: Spark's
    // CheckpointFileManager prefers FileContext (which needs a separate
    // fs.AbstractFileSystem binding) and must fall back to the
    // FileSystem-based manager for schemes like this one — if any layer
    // secretly assumes java.io paths, this drain fails or loses commits
    val base = mockRoot("graft-mockfs-pipe-")
    val src = base + "/src"; val dst = base + "/dst"; val ckpt = base + "/ckpt"
    (1L to 40L).map(i => (i, i % 5)).toDF("id", "grp")
      .write.format("lance").option("maxRowsPerFile", "10").save(src)
    def drainOnce(): Unit = {
      val q = spark.readStream.format("lance").load(src)
        .filter($"grp" =!= 0L)
        .writeStream.format("lance")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst)
      assert(q.awaitTermination(120000), "mockfs streaming drain timed out")
    }
    drainOnce()
    assert(spark.read.format("lance").load(dst).count() === 32)
    // append more source rows; the SAME checkpoint (on mockfs) must
    // resume from the recorded offset and ingest only the delta
    (41L to 50L).map(i => (i, i % 5)).toDF("id", "grp")
      .write.format("lance").mode("append").save(src)
    drainOnce()
    val out = spark.read.format("lance").load(dst)
    assert(out.count() === 40, "checkpoint resume double- or under-ingested")
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      (1L to 50L).filter(_ % 5 != 0).toSet)
  }

  test("object-store op audit: 3-table streaming state pays a bounded, history-flat FS op count per micro-batch") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.countfs.impl", classOf[CountingMockFs].getName)
    def countRoot(p: String): String =
      "countfs://" + java.nio.file.Files.createTempDirectory(p).toString
    val keysT = countRoot("graft-cfs-k-") + "/t"
    val setsT = countRoot("graft-cfs-s-") + "/t"
    val dst = countRoot("graft-cfs-d-") + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-cfs-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cfs-ck-").toString
    // stage 1: 4 micro-batches against empty state
    CountingMockFs.reset()
    val df = graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT, srcParts = 4,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
    val ops1 = CountingMockFs.total
    val snap1 = CountingMockFs.snapshot
    println(s"[fs-audit] stage1 ops/batch=${ops1 / 4.0} breakdown=$snap1")
    println(s"[fs-audit] stage1 byRoot=${CountingMockFs.snapshotByRoot.toSeq.sorted}")
    val streamed = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // twin: identical pairs as the same pipeline on a plain local scheme
    val keysL = java.nio.file.Files.createTempDirectory("graft-cfs-kl-").toString + "/t"
    val setsL = java.nio.file.Files.createTempDirectory("graft-cfs-sl-").toString + "/t"
    val local = graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysL, setsL, srcParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed === local, "op-counted scheme changed the answer")
    // stage 2: 4 MORE real micro-batches (new source files + the SAME
    // checkpoint, so bids advance past the guards) with the state tables
    // now populated — object-store op count must stay flat as history
    // accumulates (probe IO is bucket-cover-bounded; guards are one
    // manifest read per table)
    Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      .repartition(4).write.mode("append").parquet(srcDir)
    CountingMockFs.reset()
    graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT, srcParts = 4,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
    val ops2 = CountingMockFs.total
    val snap2 = CountingMockFs.snapshot
    println(s"[fs-audit] stage2 ops/batch=${ops2 / 4.0} breakdown=$snap2")
    println(s"[fs-audit] stage2 byRoot=${CountingMockFs.snapshotByRoot.toSeq.sorted}")
    // the COMMIT side (creates: fragment files + manifest versions +
    // sidecars) is history-flat — folding the 3 per-table appends into
    // one tagged commit would shave ~2 creates/batch out of hundreds of
    // ops, so commit count does NOT dominate and the 3-table layout
    // stands (the r16(10) wall-time experiment said the same locally;
    // this pins it in the object-store cost model)
    assert(snap2.getOrElse("create", 0L) <= snap1.getOrElse("create", 0L) * 3 / 2,
      s"commit-side op count grew with history: $snap1 -> $snap2")
    // the READ side DOES grow with accumulated state fragments (each
    // history fragment in the probe's bucket cover costs getFileStatus +
    // open round trips) — which is exactly what the maintenance
    // compaction is for. stage 3: compact both state tables, then 4 more
    // batches must pay ~stage-1 ops again, not stage-2's
    graft.sources.lance.LanceMaintenance.compact(spark, keysT, 1000000000L, 10000000L)
    graft.sources.lance.LanceMaintenance.compact(spark, setsT, 1000000000L, 10000000L)
    Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      .repartition(4).write.mode("append").parquet(srcDir)
    CountingMockFs.reset()
    graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT, srcParts = 4,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
    val ops3 = CountingMockFs.total
    println(s"[fs-audit] stage3 ops/batch=${ops3 / 4.0} breakdown=${CountingMockFs.snapshot}")
    assert(ops3 < ops2,
      s"compaction did not reduce per-batch FS ops: stage2=$ops2 stage3=$ops3")
    // and recovery is to near-baseline, not a token improvement (measured
    // ~1.4x of stage 1 — the residual is the uncompacted dst history)
    assert(ops3 <= ops1 * 2,
      s"post-compaction FS ops not near baseline: stage1=$ops1 stage3=$ops3")
    // stage 4 (r17, the in-stream cadence arm): 4 more batches with
    // compactEvery=2 + vacuumOnCompact — the pipeline folds dst AND both
    // state tables itself and drops superseded fragments/manifests as it
    // goes (maintenance cost paid inside this stage, uncounted)
    Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      .repartition(4).write.mode("append").parquet(srcDir)
    graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT, srcParts = 4,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst,
        compactEvery = 2, vacuumOnCompact = true)
    // vacuum kept the manifest history ∝ commits-since-last-cadence, not
    // ∝ stream history (16 batches × 1 append version per table so far)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(graft.sources.lance.ManifestIO.listVersions(keysT, conf).size <= 4,
      "in-stream vacuum left old manifest versions behind")
    // stage 5: 4 MORE batches, plain (counted) — per-batch FS ops after
    // the cadence stage must sit at ~stage-1 baseline even though the
    // stream is now 16 batches deep, pinning the full recovery the
    // stage-3 manual pass could not reach (dst history was the residual)
    Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      .repartition(4).write.mode("append").parquet(srcDir)
    CountingMockFs.reset()
    graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT, srcParts = 4,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
    val ops5 = CountingMockFs.total
    println(s"[fs-audit] stage5 ops/batch=${ops5 / 4.0} breakdown=${CountingMockFs.snapshot}")
    assert(ops5 < ops2,
      s"cadence did not keep per-batch FS ops below the uncompacted level: stage2=$ops2 stage5=$ops5")
    assert(ops5 <= ops1 * 2,
      s"post-cadence FS ops not near baseline 16 batches in: stage1=$ops1 stage5=$ops5")
  }

  test("semantic MV op audit: a pair batch's survivor-view ops track the touched components, not the view size") {
    // q_stream_semantic's scale claim measured: the upsert probes the
    // view by `vec_id IN` / `lbl IN` (fragment range/bloom pruning), so
    // a pair batch touching ONE two-member component must pay ~the same
    // view FS ops whether the view holds 8 vectors or 50. Only the view
    // sits on the counting scheme — keys/state/src/ckpt stay local, so
    // the counter isolates exactly the claim.
    spark.sparkContext.hadoopConfiguration
      .set("fs.countfs.impl", classOf[CountingMockFs].getName)
    val survT = "countfs://" +
      java.nio.file.Files.createTempDirectory("ssem-audit-s-").toString + "/t"
    val keysT = java.nio.file.Files.createTempDirectory("ssem-audit-k-").toString + "/t"
    val vecsT = java.nio.file.Files.createTempDirectory("ssem-audit-v-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("ssem-audit-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssem-audit-ck-").toString
    import spark.implicits._
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](64); parts.foreach { case (i, x) => a(i) = x }; a
    }
    def write(rows: Seq[(Long, Int, Array[Float])]): Unit =
      rows.toDF("vec_id", "label", "embedding")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def run(): Unit = { // drain only; the returned view df stays lazy
      graft.operators.StreamingOps.streamSemanticAt(spark, sf, keysT, vecsT,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = survT)
      ()
    }
    // 8 orthogonal singletons, then a pair batch against a SMALL view
    write((1L to 8L).map(i => (i, 0, vec((i - 1).toInt -> 1f))))
    run()
    // filler dims 60/50 stay clear of the singleton axes (8..47)
    write(Seq((20L, 0, vec(0 -> 1f, 60 -> 1.2f)))) // pairs with id 1
    CountingMockFs.reset(); run()
    val opsSmall = CountingMockFs.total
    // grow the view with 4 more singleton-only batches (no view reads)
    (0 until 4).foreach { b =>
      write((0 until 10).map(j =>
        (30L + b * 10 + j, 0, vec((8 + b * 10 + j) -> 1f))))
    }
    run()
    // a pair batch against the LARGE view: same touched shape (one
    // two-member component), must pay ~the same view ops
    write(Seq((90L, 0, vec(1 -> 1f, 50 -> 1.2f)))) // pairs with id 2
    CountingMockFs.reset(); run()
    val opsLarge = CountingMockFs.total
    println(s"[ssem-audit] pair-batch view ops: small-view=$opsSmall large-view=$opsLarge")
    assert(opsLarge <= opsSmall * 2,
      s"view ops grew with view size, not touched set: $opsSmall -> $opsLarge")
    // and the answer over the whole run is the expected survivor set
    val survivors = spark.read.format("lance").load(survT)
      .filter(col("vec_id") === col("lbl")).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val expected = ((1L to 8L) ++ (30L until 70L).map(identity)).sorted
    assert(survivors === expected,
      s"survivors wrong: ${survivors.take(20)}... (${survivors.size})")
  }

  test("semantic MV cadence: in-stream compaction+vacuum keep view history and per-batch view ops flat; answer identical") {
    // r17 verdict item 3: the MV upsert writes one coalesce(1) fragment +
    // one manifest version per batch, so WITHOUT the cadence the view's
    // probe cost (HEAD+GET per fragment) and manifest history accrue ∝
    // stream length. With compactEvery=2 + vacuumOnCompact the view must
    // pay a LATE pair batch ~what it paid an EARLY one (8 batches of
    // history in between), hold a bounded manifest history at stream end,
    // and answer identically to the uncadenced twin over the same source.
    spark.sparkContext.hadoopConfiguration
      .set("fs.countfs.impl", classOf[CountingMockFs].getName)
    val survT = "countfs://" +
      java.nio.file.Files.createTempDirectory("ssem-cad-s-").toString + "/t"
    val keysT = java.nio.file.Files.createTempDirectory("ssem-cad-k-").toString + "/t"
    val vecsT = java.nio.file.Files.createTempDirectory("ssem-cad-v-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("ssem-cad-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssem-cad-ck-").toString
    import spark.implicits._
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](64); parts.foreach { case (i, x) => a(i) = x }; a
    }
    def write(rows: Seq[(Long, Int, Array[Float])]): Unit =
      rows.toDF("vec_id", "label", "embedding")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def run(): Unit = {
      graft.operators.StreamingOps.streamSemanticAt(spark, sf, keysT, vecsT,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = survT,
        compactEvery = 2, vacuumOnCompact = true)
      ()
    }
    // b0: 8 orthogonal singletons; b1: a pair batch (EARLY measure — odd
    // bid, so the measured batch never includes the cadence's own ops)
    write((1L to 8L).map(i => (i, 0, vec((i - 1).toInt -> 1f))))
    run()
    write(Seq((20L, 0, vec(0 -> 1f, 60 -> 1.2f)))) // pairs with id 1
    CountingMockFs.reset(); run()
    val opsEarly = CountingMockFs.total
    // b2..b6: five singleton-only growth batches (40 vectors, axes 8..47;
    // 5 upsert commits + cadence hits at bids 2/4/6 fold them back down)
    (0 until 5).foreach { b =>
      write((0 until 8).map(j => (100L + b * 8 + j, 0, vec((8 + b * 8 + j) -> 1f))))
    }
    run()
    // b7: a pair batch against the grown view (LATE measure, odd bid)
    write(Seq((200L, 0, vec(1 -> 1f, 50 -> 1.2f)))) // pairs with id 2
    CountingMockFs.reset(); run()
    val opsLate = CountingMockFs.total
    println(s"[ssem-cadence] pair-batch view ops: early=$opsEarly late=$opsLate")
    assert(opsLate <= opsEarly * 2,
      s"view ops grew with stream history despite the cadence: $opsEarly -> $opsLate")
    // vacuum kept the view's manifest history bounded (∝ commits since
    // the last cadence hit, not ∝ the 8-batch stream)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(graft.sources.lance.ManifestIO.listVersions(survT, conf).size <= 4,
      "in-stream vacuum left the view's old manifest versions behind")
    // answer identical: replay the same source through fresh state with
    // the cadence OFF — the survivor view must match row-for-row
    val survivors = spark.read.format("lance").load(survT)
      .filter(col("vec_id") === col("lbl"))
      .select("vec_id", "label").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val keysT2 = java.nio.file.Files.createTempDirectory("ssem-cad-k2-").toString + "/t"
    val vecsT2 = java.nio.file.Files.createTempDirectory("ssem-cad-v2-").toString + "/t"
    val plain = graft.operators.StreamingOps.streamSemanticAt(spark, sf,
      keysT2, vecsT2, srcDir0 = srcDir,
      ckpt0 = java.nio.file.Files.createTempDirectory("ssem-cad-ck2-").toString,
      dst0 = java.nio.file.Files.createTempDirectory("ssem-cad-s2-").toString + "/t")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(survivors === plain, "cadence changed the survivor view")
  }

  test("text index on a non-file scheme: standing index seen, version pin round-trips, appendDelta replay no-ops") {
    registerMockFs()
    val conf = spark.sparkContext.hadoopConfiguration
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text").limit(120)
    val root = mockRoot("graft-mockfs-tidx-") + "/idx"
    graft.operators.TextIndex.build(spark, docs, root)
    // CALL system.search's reuse gate: exists + version pin — both must
    // see the mockfs index (File-based checks would force a rebuild and
    // re-stamp on EVERY call)
    assert(!new java.io.File(root + "/postings").exists())
    assert(graft.operators.TextIndex.exists(root, conf))
    graft.operators.TextIndex.recordCorpusVersion(root, 7L, conf)
    assert(graft.operators.TextIndex.recordedCorpusVersion(root, conf) === Some(7L))
    graft.operators.TextIndex.recordCorpusVersion(root, 9L, conf) // rebuild re-stamps
    assert(graft.operators.TextIndex.recordedCorpusVersion(root, conf) === Some(9L))
    // index served from the mock scheme == index served from local disk
    val queries = docs.limit(5)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(lower(col("text")), "\\W+"), 1, 3)).as("term"))
      .filter(length(col("term")) > 2)
    val localRoot = java.nio.file.Files.createTempDirectory("graft-local-tidx-").toString + "/idx"
    graft.operators.TextIndex.build(spark, docs, localRoot)
    val fromMock = graft.operators.TextIndex.search(spark, root, queries, 5)
      .collect().map(_.toSeq).toSet
    val fromLocal = graft.operators.TextIndex.search(spark, localRoot, queries, 5)
      .collect().map(_.toSeq).toSet
    assert(fromMock.nonEmpty && fromMock === fromLocal)
    // streaming maintenance twin: a replayed appendDelta batch must no-op
    // per table (its guard reads the high-water mark THROUGH the FS)
    val root2 = mockRoot("graft-mockfs-tidx2-") + "/idx"
    graft.operators.TextIndex.appendDelta(spark, docs, root2, bid = 0L)
    val postings = spark.read.format("lance").load(root2 + "/postings").count()
    val terms = spark.read.format("lance").load(root2 + "/terms").count()
    assert(postings > 0L)
    graft.operators.TextIndex.appendDelta(spark, docs, root2, bid = 0L) // at-least-once replay
    assert(spark.read.format("lance").load(root2 + "/postings").count() === postings,
      "replayed appendDelta re-appended postings — guard disarmed off local FS")
    assert(spark.read.format("lance").load(root2 + "/terms").count() === terms)
  }

  test("default maintenance cadence arms on a long stream: state fragments fold at the hit, answer identical to explicit-off") {
    // r19 candidate 4 (landed r18): the *At streaming entry points now
    // default compactEvery = DefaultCompactEvery (16). Gate/spec streams
    // (4-8 batches) never reach a hit — their behavior is pinned unchanged
    // by every existing spec — so THIS spec drives the default past the
    // threshold: an 18-micro-batch stream with NO cadence argument must
    // (a) fold its state tables' small fragments at bid 16, and (b) find a
    // cross-batch pair whose history side was folded two batches earlier —
    // proving the default arms AND compaction preserves probe-visible
    // state. The explicit compactEvery = 0 twin over the same source is
    // the uncadenced baseline for both the answer and the fragment count.
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("cad-def-src-").toString
    // batch i carries ids {2i, 2i+1}, each with fully per-id vocabulary
    // (Jaccard 0 across distinct docs) — except: id 17 (batch 8) copies
    // id 2's text (pre-hit cross-batch pair) and id 35 (batch 17) copies
    // id 0's text (a pair whose history side sits in fragments the
    // bid-16 fold just rewrote)
    def textOf(id: Long): String = {
      val base = if (id == 17L) 2L else if (id == 35L) 0L else id
      (0 until 6).map(j => s"w${base}x$j").mkString(" ")
    }
    for (i <- 0 until 18) {
      Seq(2L * i, 2L * i + 1).map(id => (id, textOf(id)))
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    def run(compactEvery: Option[Int]): (Seq[(Long, Long)], Int, Int) = {
      val keysT = java.nio.file.Files.createTempDirectory("cad-def-k-").toString + "/t"
      val setsT = java.nio.file.Files.createTempDirectory("cad-def-v-").toString + "/t"
      val ckpt = java.nio.file.Files.createTempDirectory("cad-def-ck-").toString
      val dst = java.nio.file.Files.createTempDirectory("cad-def-d-").toString + "/t"
      val got = compactEvery match {
        case Some(n) => graft.operators.StreamingOps.streamNearDedupAt(
          spark, sf, keysT, setsT, buckets = 2,
          srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst, compactEvery = n)
        case None => graft.operators.StreamingOps.streamNearDedupAt(
          spark, sf, keysT, setsT, buckets = 2,
          srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
      }
      val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val conf = spark.sparkContext.hadoopConfiguration
      def frags(t: String): Int =
        graft.sources.lance.ManifestIO.loadLatest(t, conf).get.fragments.size
      (pairs, frags(keysT), frags(setsT))
    }
    val (defPairs, defKeyFrags, defVecFrags) = run(None)
    val (offPairs, offKeyFrags, offVecFrags) = run(Some(0))
    // the post-fold batch still finds its cross-batch pair, and the two
    // configurations answer identically
    assert(defPairs === Seq((0L, 35L), (2L, 17L)), s"pairs wrong: $defPairs")
    assert(defPairs === offPairs, "default cadence changed the answer")
    // the uncadenced twin holds one state fragment per data batch; the
    // default must have folded each table's history at bid 16, leaving
    // only the fold output plus the post-hit appends (bid 17)
    println(s"[cad-default] keys frags: default=$defKeyFrags off=$offKeyFrags; " +
      s"state frags: default=$defVecFrags off=$offVecFrags")
    assert(offKeyFrags >= 18 && offVecFrags >= 18,
      s"baseline not fragment-per-batch ($offKeyFrags/$offVecFrags) — fold assert vacuous")
    assert(defKeyFrags < offKeyFrags && defVecFrags < offVecFrags,
      s"default cadence never folded: keys $defKeyFrags vs $offKeyFrags, " +
        s"state $defVecFrags vs $offVecFrags")
    assert(defKeyFrags <= 4 && defVecFrags <= 4,
      s"fold left more than (merged + post-hit) fragments: $defKeyFrags/$defVecFrags")
  }
}
