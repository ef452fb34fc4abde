package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak harness: replicates the sf0.1 tables ~100× (≈ SF 10) into
  * /tmp/graft-soak and times the headline operator shapes on them — the
  * local evidence that the plans hold at 2-3 orders of magnitude above the
  * correctness-gate scale (fragment-parallel scans, bucket-bounded dedup,
  * probe-pruned index search). Not part of the driver contract; run with
  *   sbt "runMain graft.Soak [mult]"
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "/tmp/graft-soak"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[soak] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def soakTable(name: String, m: Int)(remap: (DataFrame, org.apache.spark.sql.Column) => DataFrame): String = {
      val path = s"$out/${name}_x$m.parquet"
      if (!new java.io.File(path).exists()) {
        val base = Tables.t(spark, sfDir, name)
        timed(s"replicate $name x$m") {
          remap(base.crossJoin(spark.range(m).toDF("rep")), col("rep"))
            .drop("rep")
            .repartition(64)
            .write.mode("overwrite").parquet(path)
        }
      }
      path
    }

    // ---- lineitem ×mult: TPC-H Q1 shape ----------------------------------
    val liPath = soakTable("lineitem", mult)((df, _) => df)
    val li = spark.read.parquet(liPath)
    println(s"[soak] lineitem rows = ${li.count()}")
    timed("q1-style agg") {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))
        .collect()
    }

    // ---- embeddings ×mult: brute KNN + IVF probe search ------------------
    val embPath = soakTable("embeddings", mult)((df, rep) =>
      df.withColumn("vec_id", col("vec_id") * mult + rep))
    val emb = spark.read.parquet(embPath)
    println(s"[soak] embeddings rows = ${emb.count()}")
    val qv = emb.filter(col("vec_id") === 1L).select("embedding")
      .first().getSeq[Float](0).map(_.toDouble).toArray
    timed("brute knn cosine top-10") {
      val qvDf = Seq(Tuple1(qv.map(_.toFloat))).toDF("qv")
      emb.crossJoin(broadcast(qvDf))
        .select(col("vec_id"),
          round(graft.functions.vec_cosine(col("embedding"), col("qv")), 6).as("s"))
        .orderBy(col("s").desc, col("vec_id").asc).limit(10).collect()
    }
    val idxRoot = s"$out/ivf_x$mult"
    if (!new java.io.File(idxRoot).exists()) {
      timed("ivf build (64 cells)") {
        operators.IndexBuild.build(spark, emb, idxRoot,
          Map("index.type" -> "IVF_FLAT", "index.num-partitions" -> "64"))
      }
    }
    val idx = operators.IndexBuild.load(spark, idxRoot)
    timed("ivf search nprobes=4 (of 64)") {
      operators.IndexBuild.search(spark, idx, qv,
        Map("vector.nprobes" -> "4", "vector.k" -> "10"), excludeVecId = 1L).collect()
    }
    timed("ivf search nprobes=64 (exact)") {
      operators.IndexBuild.search(spark, idx, qv,
        Map("vector.nprobes" -> "64", "vector.k" -> "10"), excludeVecId = 1L).collect()
    }

    // ---- documents ×mult/8: bucket-bounded near-dup ----------------------
    val dmult = math.max(2, mult / 8)
    val docPath = soakTable("documents", dmult)((df, rep) =>
      df.withColumn("doc_id", col("doc_id") * dmult + rep)
        .withColumn("text", concat(col("text"), lit(" r"), rep)))
    val docs = spark.read.parquet(docPath)
    println(s"[soak] documents rows = ${docs.count()}")
    timed("exact dedup (sha2 groupBy)") {
      docs.groupBy(sha2(col("text"), 256)).agg(count(lit(1))).count()
    }
    timed("minhash-LSH near-dup pairs") {
      val base = docs
        .withColumn("sh", graft.functions.shingle_hashes(col("text"), 3))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("sh"),
          graft.functions.minhash(col("sh"), 128, 42L).as("sig"))
      val bands = base.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 31), b -> hash(slice(sig, b * 4 + 1, 4)))")))
        .toDF("doc_id", "band_idx", "band_key")
      val mega = bands.groupBy("band_idx", "band_key").count()
        .filter(col("count") > 100).select("band_idx", "band_key")
      val capped = bands.join(broadcast(mega), Seq("band_idx", "band_key"), "left_anti")
      val cand = capped.select(col("doc_id").as("a_id"), col("band_idx"), col("band_key"))
        .join(capped.select(col("doc_id").as("b_id"), col("band_idx"), col("band_key")),
          Seq("band_idx", "band_key"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      println(s"[soak]   candidate pairs = ${cand.count()}")
    }
    spark.stop()
  }
}
