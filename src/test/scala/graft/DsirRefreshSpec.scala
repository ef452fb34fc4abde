package graft

import org.apache.spark.sql.functions._

/** CALL system.dsir_refresh — the drift-gated retrain posture for the
  * selection family, mirroring the reindex procedure's spec: an
  * in-distribution append NO-OPs (the standing selection and its λ are
  * still right), a shifted pool triggers retrain + rescore + atomic MV
  * swap, and the post-retrain selection equals a fresh full run. */
class DsirRefreshSpec extends SparkSpec {

  test("CALL system.dsir_refresh: no-op in-distribution, retrain on drift, matches fresh run") {
    spark.conf.set("spark.sql.catalog.lance_dsr",
      classOf[graft.sources.lance.LanceCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("graft-dsrproc-").toString
    spark.conf.set("spark.sql.catalog.lance_dsr.warehouse", wh)
    spark.sql("CREATE NAMESPACE lance_dsr.db")
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
    val d = Tables.t(spark, sf, "documents").select("doc_id", "source", "lang", "text")
    val root = s"$wh/db/docs"
    d.write.format("lance").save(root)
    val callArgs = "id_column => 'doc_id', text_column => 'text', " +
      "target_predicate => 'lang = ''en''', k => 50"
    spark.sql(s"CALL lance_dsr.system.dsir(table => 'db.docs', $callArgs, " +
      "output_table => 'db.sel')")
    val selRoot = s"$wh/db/sel"
    val v0 = graft.sources.lance.ManifestIO.loadLatest(selRoot, conf).get.version

    // in-distribution growth: duplicate the corpus under fresh ids — the
    // bucket DISTRIBUTIONS are unchanged, so the gate must no-op
    d.select((col("doc_id") + 1000000).as("doc_id"), col("source"),
        col("lang"), col("text"))
      .write.format("lance").mode("append").save(root)
    val r1 = spark.sql("CALL lance_dsr.system.dsir_refresh(table => 'db.docs', " +
      s"$callArgs, output_table => 'db.sel', threshold => 0.02)").collect().head
    info(s"in-distribution drift: ${r1.getDouble(0)}")
    assert(!r1.getBoolean(2), s"in-distribution drift ${r1.getDouble(0)} retrained")
    assert(r1.getDouble(0) < 0.02)
    assert(graft.sources.lance.ManifestIO.loadLatest(selRoot, conf).get.version === v0,
      "no-op refresh must not touch the selection MV")

    // a shifted pool: a templated source floods the non-target slice with
    // vocabulary the baseline never saw — λ is stale, the gate must fire
    val shifted = spark.range(2000000, 2000400)
      .select(col("id").as("doc_id"), lit("templated").as("source"),
        lit("xx").as("lang"),
        concat(lit("zxqv wub " * 12), col("id").cast("string")).as("text"))
    shifted.write.format("lance").mode("append").save(root)
    val r2 = spark.sql("CALL lance_dsr.system.dsir_refresh(table => 'db.docs', " +
      s"$callArgs, output_table => 'db.sel', threshold => 0.02)").collect().head
    info(s"shifted drift: ${r2.getDouble(0)}")
    assert(r2.getBoolean(2), s"shifted drift ${r2.getDouble(0)} did not retrain")
    assert(r2.getDouble(0) > 0.02)
    assert(graft.sources.lance.ManifestIO.loadLatest(selRoot, conf).get.version > v0,
      "retrain must swap the selection MV")

    // post-retrain baseline is fresh: an immediate second refresh no-ops...
    val r3 = spark.sql("CALL lance_dsr.system.dsir_refresh(table => 'db.docs', " +
      s"$callArgs, output_table => 'db.sel', threshold => 0.02)").collect().head
    assert(!r3.getBoolean(2) && r3.getDouble(0) == 0.0,
      s"post-retrain drift ${r3.getDouble(0)} (same corpus, same counts) must be 0")

    // ...and the refreshed selection equals a fresh full run bit-for-bit
    spark.sql(s"CALL lance_dsr.system.dsir(table => 'db.docs', $callArgs, " +
      "output_table => 'db.sel2')")
    val refreshed = spark.read.format("lance").load(selRoot)
      .orderBy("doc_id").collect().map(_.toSeq)
    val fresh = spark.read.format("lance").load(s"$wh/db/sel2")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(refreshed.toSeq === fresh.toSeq)
    assert(refreshed.nonEmpty)
  }
}
