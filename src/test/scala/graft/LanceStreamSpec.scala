package graft

import graft.sources.lance.{LanceMaintenance, ManifestIO}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Streaming source (fragment tailing), compaction, and vacuum. */
class LanceStreamSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-lstream-").toString
  private def conf = spark.sessionState.newHadoopConf()

  test("streaming source tails new fragments per version") {
    val root = tmp()
    val out = tmp(); val ckpt = tmp()
    val region = Tables.t(spark, sf, "region")
    region.write.format("lance").save(root)

    def runOnce(): Unit = {
      val q = spark.readStream.format("lance").load(root)
        .writeStream.format("parquet").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(out)
      q.awaitTermination(120000)
    }

    // batch 1: reads everything present at stream start
    runOnce()
    assert(spark.read.parquet(out).count() === region.count())

    // append a new version; the restarted stream (same checkpoint) must
    // read ONLY the new fragments — total becomes 5 + 25
    Tables.t(spark, sf, "nation").select(
      col("n_nationkey").as("r_regionkey"), col("n_name").as("r_name"))
      .write.format("lance").mode("append").save(root)
    runOnce()
    assert(spark.read.parquet(out).count() === region.count() + 25)
  }

  test("streaming appends to a bucketed table keep the SPJ layout") {
    spark.conf.set("spark.sql.catalog.lance_sb", classOf[graft.sources.lance.LanceCatalog].getName)
    val wh = tmp(); val ckpt = tmp(); val srcRoot = tmp()
    spark.conf.set("spark.sql.catalog.lance_sb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lance_sb.db")
    spark.sql("CREATE TABLE lance_sb.db.t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES('write.bucket-by'='id','write.bucket-count'='4')")
    // stream a lance source into the bucketed catalog table
    spark.range(1000).selectExpr("id", "id * 3 AS v")
      .write.format("lance").save(srcRoot)
    val q = spark.readStream.format("lance").load(srcRoot)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).toTable("lance_sb.db.t")
    q.awaitTermination(120000)
    val m = ManifestIO.loadLatest(s"$wh/db/t", conf).get
    assert(m.totalRows === 1000)
    assert(m.fragments.nonEmpty && m.fragments.forall(_.bucket.isDefined))
    // the tag must equal the actual pmod(murmur3(id), 4) of every row —
    // i.e. Spark really applied the required distribution per micro-batch
    val perFile = spark.sql(
      "SELECT _file, pmod(hash(id), 4) AS b FROM lance_sb.db.t")
      .groupBy("_file").agg(countDistinct(col("b")).as("nb"), first(col("b")).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(perFile.forall(_._2 === 1L), s"mixed-bucket streamed fragment: $perFile")
    for (fr <- m.fragments) {
      val actual = perFile.find(_._1.endsWith(fr.path)).get._3
      assert(fr.bucket.contains(actual), s"${fr.path}: tag=${fr.bucket} actual=$actual")
    }
    // Spark honors requiredOrdering per micro-batch too (SPARK-34183), so
    // the streamed fragments carry a TRUTHFUL sortedBy stamp — if this
    // ever regresses, the sort-elided SMJ over streamed data would be
    // wrong, so verify the rows really are sorted inside each file
    assert(m.fragments.forall(_.sortedBy === Seq("id")))
    val unsorted = spark.read.format("lance").load(s"$wh/db/t")
      .select(col("_file"), col("id"))
      .groupBy("_file").agg(expr("collect_list(id)").as("ids"))
      .collect()
      .filter { r => val ids = r.getSeq[Long](1); ids != ids.sorted }
    assert(unsorted.isEmpty,
      s"streamed fragments not sorted: ${unsorted.map(_.getString(0)).toSeq}")
  }

  test("read.max-rows-per-trigger bounds catch-up micro-batches at version granularity") {
    import spark.implicits._
    val root = tmp(); val ckpt = tmp()
    // three commits of 4 / 4 / 2 rows
    (1 to 4).map(i => (i.toLong, s"a$i")).toDF("id", "v").coalesce(1)
      .write.format("lance").save(root)
    (5 to 8).map(i => (i.toLong, s"b$i")).toDF("id", "v").coalesce(1)
      .write.format("lance").mode("append").save(root)
    (9 to 10).map(i => (i.toLong, s"c$i")).toDF("id", "v").coalesce(1)
      .write.format("lance").mode("append").save(root)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("lance")
      .option("read.max-rows-per-trigger", "4").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += df.count(); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // capped at 4 rows per batch → versions drain one per batch (4, 4, 2),
    // never all 10 in one
    assert(batches.sum === 10L, batches)
    assert(batches.forall(_ <= 4L), batches)
    assert(batches.count(_ > 0) === 3, batches)
  }

  test("change feed streams inserts and deletes with _change_type; compaction emits nothing") {
    import graft.sources.lance.{LanceDelete, LanceMaintenance}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.sources.EqualTo
    import spark.implicits._
    val root = tmp()
    // v1: fragment with ids 1-3
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1)
      .write.format("lance").save(root)
    // v2: positional delete of id=2 (DV on the fragment)
    LanceDelete.deleteWhere(spark, root, Array(EqualTo("id", 2L)), Map.empty)
    // v3: append ids 4-5
    Seq((4L, "d"), (5L, "e")).toDF("id", "v").coalesce(1)
      .write.format("lance").mode("append").save(root)
    // v4: compaction — a file reorganization, not a data change
    LanceMaintenance.compact(spark, root, smallerThanRows = 100, targetRows = 100)
    assert(ManifestIO.loadLatest(root, conf).get.op === "compact")

    // batch read with the option labels every row insert
    val batch = spark.read.format("lance").option("read.change-feed", "true").load(root)
    assert(batch.schema.fieldNames.contains("_change_type"))
    assert(batch.select("_change_type").distinct().collect().map(_.getString(0)).toSeq
      === Seq("insert"))

    val ckpt = tmp()
    val q = spark.readStream.format("lance").option("read.change-feed", "true")
      .load(root)
      .select(col("id"), col("_change_type"))
      .writeStream.format("memory").queryName("cdc_feed")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("cdc_feed").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // v1 inserts 1,2,3; v2 deletes 2; v3 inserts 4,5; v4 emits nothing
    assert(rows === Seq((1L, "insert"), (2L, "delete"), (2L, "insert"),
      (3L, "insert"), (4L, "insert"), (5L, "insert")), rows)

    // a delete that drops a whole fragment replays its live rows as deletes
    spark.sql(s"CREATE OR REPLACE TEMP VIEW cdc_all AS SELECT * FROM VALUES (4),(5) AS x(id)")
    LanceDelete.deleteWhere(spark, root, Array(EqualTo("v", "zzz")), Map.empty) // no-op
    val mBefore = ManifestIO.loadLatest(root, conf).get
    // compacted table = one fragment with ids 1,3,4,5 — delete 1,3,4,5 via
    // positions, leaving... instead drop whole fragment via all-match range
    LanceDelete.deleteWhere(spark, root,
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 0L)), Map.empty)
    assert(ManifestIO.loadLatest(root, conf).get.fragments.isEmpty)
    val q2 = spark.readStream.format("lance").option("read.change-feed", "true")
      .load(root)
      .select(col("id"), col("_change_type"))
      .writeStream.format("memory").queryName("cdc_feed2")
      .option("checkpointLocation", tmp())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val rows2 = spark.table("cdc_feed2").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // full replay now ends with delete rows for every live id (1,3,4,5)
    val deletes2 = rows2.filter(_._2 == "delete").map(_._1).sorted
    assert(deletes2 === Seq(1L, 2L, 3L, 4L, 5L), rows2)
  }

  test("CDC-maintained aggregate: maintenance reads deltas, not the base") {
    import graft.sources.lance.LanceDelete
    import spark.implicits._
    val root = tmp()
    // base: 100 rows in one group column
    (1L to 100L).map(i => (i, s"g${i % 3}", i * 10L)).toDF("id", "g", "v")
      .coalesce(1).write.format("lance").save(root) // v1
    // snapshot the additive aggregate
    val mv0 = spark.read.format("lance").load(root)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    LanceDelete.deleteWhere(spark, root,
      Array(org.apache.spark.sql.sources.LessThan("id", 11L)), Map.empty) // v2
    (101L to 120L).map(i => (i, s"g${i % 3}", i * 10L)).toDF("id", "g", "v")
      .coalesce(1).write.format("lance").mode("append").save(root) // v3
    val feed = spark.read.format("lance")
      .option("read.change-feed", "true").option("read.start-version", "2")
      .load(root)
    // the maintenance read is DELTA-sized: 10 deletes + 20 inserts,
    // never the 110-row base
    assert(feed.count() === 30)
    // signed-delta merge == recompute
    val deltas = feed.select(col("g"),
        when(col("_change_type") === "insert", 1L).otherwise(-1L).as("sgn"), col("v"))
      .groupBy("g").agg(sum("sgn").as("dn"), sum(col("sgn") * col("v")).as("ds"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val merged = (mv0.keySet ++ deltas.keySet).map { g =>
      val (n0, s0) = mv0.getOrElse(g, (0L, 0L))
      val (dn, ds) = deltas.getOrElse(g, (0L, 0L))
      g -> ((n0 + dn, s0 + ds))
    }.toMap
    val recomputed = spark.read.format("lance").load(root)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged === recomputed)
  }

  test("change feed reads pre-alter fragments through the LATEST column identity") {
    // a RENAME (and a DROP + re-ADD) after the replayed versions must not
    // corrupt the feed: renamed columns carry their real values under the
    // new name, re-added names stay NULL for pre-drop fragments
    spark.conf.set("spark.sql.catalog.lance_cdcid",
      classOf[graft.sources.lance.LanceCatalog].getName)
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.lance_cdcid.warehouse", wh)
    spark.sql("CREATE NAMESPACE lance_cdcid.db")
    spark.sql("CREATE TABLE lance_cdcid.db.t AS " +
      "SELECT * FROM VALUES (1, 'x'), (2, 'y') AS v(id, tag)")
    spark.sql("ALTER TABLE lance_cdcid.db.t RENAME COLUMN tag TO label")
    spark.sql("ALTER TABLE lance_cdcid.db.t ADD COLUMN tag STRING")
    val root = s"$wh/db/t"
    val feed = spark.read.format("lance").option("read.change-feed", "true")
      .load(root)
      .select("id", "label", "tag", "_change_type")
      .orderBy("id").collect()
    assert(feed.map(_.getString(3)).toSeq === Seq("insert", "insert"))
    // the renamed column reads its REAL values (version-local identity
    // would return NULL here), and the re-added old name stays masked
    assert(feed.map(_.getString(1)).toSeq === Seq("x", "y"), feed.mkString(", "))
    assert(feed.forall(_.isNullAt(2)), feed.mkString(", "))
  }

  test("streaming MV refresh: final MV == recompute; replayed micro-batch is a no-op") {
    import graft.sources.lance.LanceDelete
    import spark.implicits._
    val base = tmp() + "/base"; val mv = tmp() + "/mv"; val ckpt = tmp() + "/ckpt"
    (1L to 60L).map(i => (i, s"p${i % 4}", i * 1.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .coalesce(1).write.format("lance").save(base)
    LanceDelete.deleteWhere(spark, base,
      Array(org.apache.spark.sql.sources.LessThan("o_orderkey", 11L)), Map.empty)
    (61L to 80L).map(i => (i, s"p${i % 4}", i * 1.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .coalesce(1).write.format("lance").mode("append").save(base)

    val mvT = graft.operators.StreamingOps.streamMvRefresh(spark, base, mv, ckpt)
    def readMv = spark.read.format("lance").load(mvT)
      .select("o_orderpriority", "n", "sum_cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = spark.read.format("lance").load(base)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(readMv === expected)

    // crash replay: drop the last checkpoint commit marker (crash after
    // the MV overwrite, before the checkpoint commit) and restart — the
    // replayed batch's bid <= the MV's recorded bid, so the refresh is a
    // no-op and the MV is unchanged (no double-applied deltas)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    graft.operators.StreamingOps.streamMvRefresh(spark, base, mv, ckpt)
    assert(readMv === expected, "replayed micro-batch double-applied deltas")
  }

  test("windowed MV: watermark closes windows (late input dropped); replay is a no-op") {
    import spark.implicits._
    def ts(h: Int, m: Int = 0) = java.sql.Timestamp.valueOf(f"2026-01-10 $h%02d:$m%02d:00")
    val schema = Seq((ts(0), "view", 0L)).toDF("ts", "event_type", "event_id").schema
    val srcDir = tmp() + "/src"; val mv = tmp() + "/mv"; val ckpt = tmp() + "/ckpt"
    def refresh() = graft.operators.StreamingOps
      .streamMvWindowRefresh(spark, srcDir, schema, mv, ckpt, delay = "1 hour")
    def readMv = spark.read.format("lance").load(mv)
      .select("w_start", "event_type", "n", "sum_id").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    // batch 1: hours 00-03; final watermark = 03:30 - 1h = 02:30
    Seq((ts(0), "view", 1L), (ts(0, 30), "view", 2L), (ts(1), "view", 3L),
        (ts(2), "buy", 4L), (ts(3, 30), "view", 5L))
      .toDF("ts", "event_type", "event_id")
      .coalesce(1).write.mode("append").parquet(srcDir)
    refresh()
    val afterB1 = readMv
    assert(afterB1((ts(0), "view", 2L, 3L)), s"hour-00 totals wrong: $afterB1")

    // batch 2: a LATE hour-00 event (window end 01:00 <= watermark 02:30 —
    // the window is FINAL, the row must be dropped) + a fresh hour-04 one
    Seq((ts(0, 45), "view", 99L), (ts(4), "buy", 6L))
      .toDF("ts", "event_type", "event_id")
      .coalesce(1).write.mode("append").parquet(srcDir)
    refresh()
    val afterB2 = readMv
    assert(afterB2((ts(0), "view", 2L, 3L)),
      s"closed hour-00 window moved — late input leaked past the watermark: $afterB2")
    assert(afterB2((ts(4), "buy", 1L, 6L)), s"fresh hour-04 row missing: $afterB2")

    // crash replay: state overwrite landed, checkpoint commit did not —
    // the replayed batch's bid <= the MV's recorded bid, so it's a no-op
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    refresh()
    assert(readMv === afterB2, "replayed micro-batch double-applied the upsert")
  }

  test("batch change feed reads an explicit version range") {
    import graft.sources.lance.LanceDelete
    import spark.implicits._
    val root = tmp()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1)
      .write.format("lance").save(root) // v1
    LanceDelete.deleteWhere(spark, root,
      Array(org.apache.spark.sql.sources.EqualTo("id", 2L)), Map.empty) // v2
    Seq((4L, "d")).toDF("id", "v").coalesce(1)
      .write.format("lance").mode("append").save(root) // v3

    def feed(opts: (String, String)*) = {
      val r = spark.read.format("lance").option("read.change-feed", "true")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(root).select("id", "_change_type")
        .collect().map(x => (x.getLong(0), x.getString(1))).sorted.toSeq
    }
    // full history: 4 inserts + 1 delete
    assert(feed("read.start-version" -> "1") ===
      Seq((1L, "insert"), (2L, "delete"), (2L, "insert"), (3L, "insert"), (4L, "insert")))
    // just the delete commit
    assert(feed("read.start-version" -> "2", "read.end-version" -> "2") ===
      Seq((2L, "delete")))
    // tail from v3
    assert(feed("read.start-version" -> "3") === Seq((4L, "insert")))
    // a bad range errors instead of silently reading the wrong thing
    intercept[Exception] {
      feed("read.start-version" -> "4")
    }
  }

  test("session state retains only the open tail for a hot key") {
    import graft.operators.StreamingOps
    val gap = 6L * 3600 * 1000000L
    val sessionSpacing = gap + 3600L * 1000000L // sessions separated by gap + 1h
    // hot key: 100 sessions x 100 events — 10k events total
    val events: Seq[Long] = (0 until 100).flatMap { s =>
      (0 until 100).map(e => s * sessionSpacing + e * 1000000L)
    }
    // watermark just past the last event: every session except the last is
    // closed (end + gap <= wm); the last is still open
    val wm = events.max + 1L
    val (closed, open) = StreamingOps.closeSessions(events, wm)
    assert(closed.size === 99, "99 of 100 sessions must close incrementally")
    assert(closed.forall(_._3 === 100L))
    // state after the batch = the open session's events only: 100 of 10_000
    assert(open.size === 100,
      s"hot-key state must hold only the open tail, got ${open.size} events")
    assert(open === events.takeRight(100))
    // watermark far past everything closes all, retains nothing
    val (allClosed, none) = StreamingOps.closeSessions(events, Long.MaxValue)
    assert(allClosed.size === 100 && none.isEmpty)
    // no watermark yet: nothing closes, everything retained (correctness
    // unchanged, just unbounded until the watermark moves)
    val (noneClosed, all) = StreamingOps.closeSessions(events, 0L)
    assert(noneClosed.isEmpty && all.size === events.size)
  }

  test("compact merges small fragments, preserving data and history") {
    val root = tmp()
    val orders = Tables.t(spark, sf, "orders")
    orders.write.format("lance").option("maxRowsPerFile", "100").save(root)
    val before = ManifestIO.loadLatest(root, conf).get
    assert(before.fragments.size > 5)

    val after = LanceMaintenance.compact(spark, root,
      smallerThanRows = 1000000, targetRows = 1000000)
    assert(after.version === before.version + 1)
    assert(after.fragments.size < before.fragments.size)
    assert(after.totalRows === before.totalRows)
    val ds = spark.read.format("lance").load(root)
    assert(ds.count() === orders.count())
    assert(ds.agg(sum("o_orderkey")).first().getLong(0) ===
      orders.agg(sum("o_orderkey")).first().getLong(0))
    // pre-compaction version still readable until vacuum
    assert(spark.read.format("lance").option("versionAsOf", before.version.toString)
      .load(root).count() === orders.count())
  }

  test("vacuum drops old versions and unreferenced fragments") {
    val root = tmp()
    val region = Tables.t(spark, sf, "region")
    region.write.format("lance").option("maxRowsPerFile", "2").save(root)
    LanceMaintenance.compact(spark, root, smallerThanRows = 100, targetRows = 100)
    assert(ManifestIO.listVersions(root, conf).size === 2)

    LanceMaintenance.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    assert(ManifestIO.listVersions(root, conf).size === 1)
    // history reflects the surviving version
    val h = LanceMaintenance.history(spark, root).collect()
    assert(h.length === 1)
    assert(h.head.getLong(3) === region.count())
    // current version fully readable; its fragment files survived
    assert(spark.read.format("lance").load(root).count() === region.count())
    // old fragment files are gone: only the compacted fragment remains
    val m = ManifestIO.loadLatest(root, conf).get
    val fs = ManifestIO.fs(root, conf)
    val dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(root, "data")).length
    assert(dataFiles === m.fragments.size)
  }
}
