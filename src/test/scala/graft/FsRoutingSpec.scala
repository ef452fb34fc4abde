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
}
