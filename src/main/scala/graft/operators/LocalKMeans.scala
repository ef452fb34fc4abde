package graft.operators

/** Deterministic driver-side KMeans for TrainCap-bounded samples (r20,
  * guide §1.2 step 1: the distributed fit's per-iteration job scheduling
  * dominated training wall at every measured scale — ~1.5-2 s inside NINE
  * timed serving keys at sf0.1 for samples of a few thousand vectors whose
  * arithmetic is microseconds).
  *
  * Algorithm: seeded k-means++ init + Lloyd's iterations, squared-L2 in
  * double, ties to the lowest center index (NearestCell's rule), empty
  * clusters keep their previous centroid. Deterministic given the point
  * order — callers sort the collected sample lexicographically, so the
  * same (corpus, k, seed) trains the same centroids on any cluster layout
  * or core count (the twin-build equality spec relies on this, as the
  * MLlib path's seed did before).
  *
  * Scale posture: this runs ONLY under [[VectorIndex.LocalTrainFlops]] /
  * byte bounds — the TrainCap sample cap already made training cost a
  * constant independent of corpus size; below the bounds that constant is
  * driver-core arithmetic, above them the former MLlib fit runs
  * unchanged. Assignment/encoding of the full corpus stays distributed
  * and codegen'd (NearestCell/PqEncode) in both regimes.
  */
private[operators] object LocalKMeans {

  /** Lexicographic float-array order — the deterministic sample order. */
  val floatArrayOrdering: java.util.Comparator[Array[Float]] =
    (a: Array[Float], b: Array[Float]) => {
      val n = math.min(a.length, b.length)
      var i = 0
      var r = 0
      while (i < n && r == 0) {
        r = java.lang.Float.compare(a(i), b(i))
        i += 1
      }
      if (r != 0) r else Integer.compare(a.length, b.length)
    }

  private def sqdist(p: Array[Float], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) { val x = p(i) - c(i); d += x * x; i += 1 }
    d
  }

  /** Train `min(k0, n)` centroids: [[Restarts]] independent seeded
    * k-means++/Lloyd's runs, keeping the lowest-SSE solution (ties to the
    * earliest restart — fully deterministic). Restarts are what the
    * driver-local regime buys over one distributed fit: they reliably
    * land a better quantization than any single run's basin, which is
    * what the partial-probe recall floors downstream actually measure. */
  def fit(points: Array[Array[Float]], k0: Int, seed: Long,
          maxIter: Int = 50): Array[Array[Double]] = {
    var best: Array[Array[Double]] = null
    var bestSse = Double.MaxValue
    var r = 0
    while (r < Restarts) {
      val c = fitOnce(points, k0, seed + 1000003L * r, maxIter)
      val sse = sseOf(points, c)
      if (sse < bestSse) { bestSse = sse; best = c }
      r += 1
    }
    best
  }

  private val Restarts = 5

  /** Per-point min-distances compute in parallel into a FIXED slot array,
    * then sum sequentially in index order (r21, advice): a parallel
    * DoubleStream sum's combine tree depends on ForkJoin common-pool
    * parallelism, so restart SSEs (and the lowest-SSE pick on near-ties)
    * would vary across core counts — breaking the any-core-count
    * same-centroids determinism the twin-build equality spec relies on. */
  private def sseOf(points: Array[Array[Float]], centers: Array[Array[Double]]): Double = {
    val d = new Array[Double](points.length)
    java.util.stream.IntStream.range(0, points.length).parallel().forEach { i =>
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < centers.length) {
        val dd = sqdist(points(i), centers(cc))
        if (dd < bestD) bestD = dd
        cc += 1
      }
      d(i) = bestD
    }
    var s = 0.0
    var i = 0
    while (i < d.length) { s += d(i); i += 1 }
    s
  }

  private def fitOnce(points: Array[Array[Float]], k0: Int, seed: Long,
                      maxIter: Int): Array[Array[Double]] = {
    val n = points.length
    require(n > 0, "LocalKMeans.fit: empty training sample")
    val dim = points(0).length
    val k = math.min(k0, n)
    val rng = new java.util.Random(seed)
    val centers = Array.ofDim[Double](k, dim)
    // k-means++ (O(n·k) with a running min-distance array)
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 0
    var pick = rng.nextInt(n)
    while (c < k) {
      var j = 0
      while (j < dim) { centers(c)(j) = points(pick)(j); j += 1 }
      c += 1
      if (c < k) {
        var sum = 0.0
        var i = 0
        while (i < n) {
          val d = sqdist(points(i), centers(c - 1))
          if (d < d2(i)) d2(i) = d
          sum += d2(i)
          i += 1
        }
        val r = rng.nextDouble() * sum
        var acc = 0.0
        pick = n - 1
        i = 0
        var found = false
        while (i < n && !found) {
          acc += d2(i)
          if (acc >= r && d2(i) > 0) { pick = i; found = true }
          i += 1
        }
        if (!found) pick = n - 1
      }
    }
    // Lloyd's
    val assign = Array.fill(n)(-1)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val movedFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0
        var bestD = Double.MaxValue
        var cc = 0
        while (cc < k) {
          val d = sqdist(points(i), centers(cc))
          if (d < bestD) { bestD = d; best = cc } // strict < keeps lowest index on ties
          cc += 1
        }
        if (assign(i) != best) { assign(i) = best; movedFlag.set(true) }
      }
      moved = movedFlag.get
      if (moved) {
        val sums = Array.ofDim[Double](k, dim)
        val counts = new Array[Long](k)
        var i = 0
        while (i < n) {
          val a = assign(i)
          counts(a) += 1
          var j = 0
          while (j < dim) { sums(a)(j) += points(i)(j); j += 1 }
          i += 1
        }
        var cc = 0
        while (cc < k) {
          if (counts(cc) > 0) {
            var j = 0
            while (j < dim) { centers(cc)(j) = sums(cc)(j) / counts(cc); j += 1 }
          } // empty cluster: keep the previous centroid
          cc += 1
        }
      }
      iter += 1
    }
    centers
  }
}
