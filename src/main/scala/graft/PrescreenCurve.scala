package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement tool behind SURVEY §7 r17(1): the two-phase semantic
  * decontamination screen at PRODUCTION dimensions. The gate fixture is
  * 64-dim, where the 4σ hamming bound is a pass-through by design — this
  * prints the numbers the two-phase shape exists for: at d=1024 with a
  * 10⁴-sized benchmark side, what fraction of corpus×bench pairs does the
  * XOR/popcount prescreen reject before any float math, how much
  * wall-time does that buy over the exact broadcast-BNL, and does the
  * flagged set stay IDENTICAL (the conservative-bound claim, measured on
  * planted near-matches sweeping the τ boundary).
  *
  *   sbt "runMain graft.PrescreenCurve"
  */
object PrescreenCurve {
  /** splitmix64 — deterministic per (row, dim) coordinate in [-1, 1). */
  private def coord(seed: Long): Float = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val d = 1024
    val nBench = 1000
    val nCorpus = 50000
    val nPlanted = 2000 // first 2k corpus rows = bench vec + s·noise
    val tau = 0.4

    def vecOf(kind: Long, id: Long): Array[Float] =
      Array.tabulate(d)(j => coord(kind * 0x517cc1b727220a95L + id * 8191L + j))
    val bench = spark.range(nBench)
      .mapPartitions(_.map(i => Tuple1(vecOf(1L, i)))).toDF("vb")
      .localCheckpoint()
    val corpus = spark.range(nCorpus).mapPartitions(_.map { i =>
      val v =
        if (i < nPlanted) {
          // s sweeps cos ≈ 1/sqrt(1+s²) through ~[0.33, 0.96] — planted
          // pairs straddle τ=0.4 so the boundary is exercised
          val b = vecOf(1L, i % nBench)
          val s = (0.3 + 2.5 * (i % 17) / 16.0).toFloat
          val g = vecOf(2L, i)
          Array.tabulate(d)(j => b(j) + s * g(j))
        } else vecOf(3L, i)
      (i, v)
    }).toDF("vec_id", "embedding").localCheckpoint()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def run(pre: Boolean): (Long, Double) = {
      val (n, t) = timed(graft.operators.VectorSearch
        .semanticMatches(corpus, bench, "embedding", tau, prescreen = pre)
        .count())
      (n, t)
    }
    // warmup both plans once, then measure
    run(pre = false); run(pre = true)
    val (nExact, tExact) = run(pre = false)
    val (nTwo, tTwo) = run(pre = true)
    val bound = graft.operators.VectorSearch.prescreenBound(d, tau)
    val admitted = corpus
      .withColumn("sig", graft.functions.bit_pack_sign(col("embedding")))
      .crossJoin(broadcast(bench
        .withColumn("bsig", graft.functions.bit_pack_sign(col("vb")))))
      .filter(graft.functions.hamming_dist(col("sig"), col("bsig")) <= bound)
      .count()
    val totalPairs = nCorpus.toLong * nBench
    println(f"[prescreen] d=$d corpus=$nCorpus bench=$nBench pairs=$totalPairs tau=$tau bound=$bound")
    println(f"[prescreen] exact:     flagged=$nExact%d  wall=$tExact%.2f s")
    println(f"[prescreen] two-phase: flagged=$nTwo%d  wall=$tTwo%.2f s  speedup=${tExact / tTwo}%.2fx")
    println(f"[prescreen] prescreen admit rate=${admitted.toDouble / totalPairs}%.6f " +
      f"(${admitted}%d of $totalPairs%d pairs reach float math)")
    require(nExact == nTwo,
      s"two-phase lost matches: exact=$nExact two-phase=$nTwo")
    spark.stop()
  }
}
