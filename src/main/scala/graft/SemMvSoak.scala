package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growing-history soak for the r17 streaming additions (SURVEY §7 r18):
  * drives q_stream_semantic's and q_stream_embedding_dedup's state through
  * N sequential micro-batches with the maintenance cadence ON and prints,
  * per batch: wall, the survivor view's / pair sink's live fragment count,
  * manifest versions, and total files on disk — the evidence that
  * per-batch serving cost AND physical footprint stay flat as the
  * view/history grows (without the cadence both accrue one coalesce(1)
  * fragment + one manifest version per batch, so the probe's per-fragment
  * HEAD+GET cost climbs with stream length).
  *
  *   sbt "runMain graft.SemMvSoak [nBatches] [compactEvery]"
  */
object SemMvSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(24)
    val compactEvery = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration

    def fileCount(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum else 1
      val d = new java.io.File(dir)
      if (d.exists()) walk(d) else 0
    }

    def stats(table: String): String = {
      val m = graft.sources.lance.ManifestIO.loadLatest(table, conf)
      val frs = m.map(_.fragments.count(_.liveRows > 0)).getOrElse(0)
      val vers = graft.sources.lance.ManifestIO.listVersions(table, conf).size
      s"frags=$frs vers=$vers files=${fileCount(table)}"
    }

    // the corpus, sliced into nBatches deterministic chunks — each batch
    // carries real labels, so every batch pays real pair/upsert work
    val e = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").localCheckpoint()

    def runSoak(name: String,
                drive: (String, String, String, String, String) => Unit): Unit = {
      val srcDir = java.nio.file.Files.createTempDirectory(s"$name-src-").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"$name-ck-").toString
      val keysT = java.nio.file.Files.createTempDirectory(s"$name-k-").toString + "/t"
      val stT = java.nio.file.Files.createTempDirectory(s"$name-v-").toString + "/t"
      val dst = java.nio.file.Files.createTempDirectory(s"$name-d-").toString + "/t"
      println(s"[soak:$name] $nBatches batches, compactEvery=$compactEvery, sf=$sfDir")
      for (b <- 0 until nBatches) {
        e.filter(pmod(col("vec_id"), lit(nBatches)) === b)
          .coalesce(1).write.mode("append").parquet(srcDir)
        val t0 = System.nanoTime()
        drive(srcDir, ckpt, keysT, stT, dst)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[soak:$name] batch=$b%2d wall=$wall%6.2f s  dst: ${stats(dst)}%s  keys: ${stats(keysT)}%s")
      }
    }

    runSoak("ssem", (src, ck, k, v, d) => {
      operators.StreamingOps.streamSemanticAt(spark, sfDir, k, v,
        srcDir0 = src, ckpt0 = ck, dst0 = d,
        compactEvery = compactEvery, vacuumOnCompact = true)
      ()
    })
    runSoak("semb", (src, ck, k, v, d) => {
      operators.StreamingOps.streamEmbeddingDedupAt(spark, sfDir, k, v,
        srcDir0 = src, ckpt0 = ck, dst0 = d,
        compactEvery = compactEvery, vacuumOnCompact = true)
      ()
    })
    spark.stop()
  }
}
