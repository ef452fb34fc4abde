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
