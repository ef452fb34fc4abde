package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement tool behind SURVEY §7 r17(1) and the r18 PrescreenMinDim
  * crossover: the two-phase semantic decontamination screen swept over
  * dimensions. The gate fixture is 64-dim, where the 4σ hamming bound is
  * a pass-through by design — this prints the numbers the two-phase
  * shape exists for: per dim (64→1024) with a 10³-sized benchmark side,
  * what fraction of corpus×bench pairs the XOR/popcount prescreen
  * rejects before any float math, how much wall-time that buys over the
  * exact broadcast-BNL, and that the flagged set stays IDENTICAL (the
  * conservative-bound claim, measured on planted near-matches sweeping
  * the τ boundary) — plus that the AUTO dimension gate equals exact at
  * every d. PrescreenMinDim is set from where speedup crosses 1.
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

    val nBench = 1000
    val nCorpus = 50000
    val nPlanted = 2000 // first 2k corpus rows = bench vec + s·noise
    val tau = 0.4

    def fixture(d: Int): (DataFrame, DataFrame) = {
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
      (corpus, bench)
    }

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- crossover sweep (r18): exact vs FORCED two-phase per dim ------
    // the auto gate (PrescreenMinDim) is set from where the forced screen
    // starts beating exact; below that the screen carries its probabilistic
    // admit bound for no wall win. Median of 3 per arm, warmed.
    println("[prescreen] dim sweep: d, exact s, two-phase s, speedup, admit rate")
    for (d <- Seq(64, 128, 256, 512, 1024)) {
      val (corpus, bench) = fixture(d)
      def run(pre: Boolean): (Long, Double) = {
        val (n, t) = timed(graft.operators.VectorSearch
          .semanticMatches(corpus, bench, "embedding", tau, prescreen = Some(pre))
          .count())
        (n, t)
      }
      run(pre = false); run(pre = true) // warm both plans
      def median3(pre: Boolean): (Long, Double) = {
        val rs = (1 to 3).map(_ => run(pre))
        (rs.head._1, rs.map(_._2).sorted.apply(1))
      }
      val (nExact, tExact) = median3(pre = false)
      val (nTwo, tTwo) = median3(pre = true)
      val bound = graft.operators.VectorSearch.prescreenBound(d, tau)
      val admitted = corpus
        .withColumn("sig", graft.functions.bit_pack_sign(col("embedding")))
        .crossJoin(broadcast(bench
          .withColumn("bsig", graft.functions.bit_pack_sign(col("vb")))))
        .filter(graft.functions.hamming_dist(col("sig"), col("bsig")) <= bound)
        .count()
      val totalPairs = nCorpus.toLong * nBench
      println(f"[prescreen] d=$d%4d exact=$tExact%6.2f s  two-phase=$tTwo%6.2f s  " +
        f"speedup=${tExact / tTwo}%5.2fx  admit=${admitted.toDouble / totalPairs}%.6f  " +
        f"bound=$bound flagged=$nExact")
      require(nExact == nTwo,
        s"two-phase lost matches at d=$d: exact=$nExact two-phase=$nTwo")
      // the AUTO default must equal exact at every d (gated rows pass
      // unconditionally below the crossover, screened-then-refined above)
      val (nAuto, _) = timed(graft.operators.VectorSearch
        .semanticMatches(corpus, bench, "embedding", tau).count())
      require(nAuto == nExact,
        s"auto prescreen changed the answer at d=$d: exact=$nExact auto=$nAuto")
    }
    spark.stop()
  }
}
