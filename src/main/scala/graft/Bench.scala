package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line (also written to /tmp/graft_bench.json so the result
  * survives sbt log prefixes).
  *
  * De-noising: each query gets a warmup execution (JVM/codegen warmup
  * otherwise lands on whichever query runs first), then the MEDIAN of 3
  * timed runs is reported; `ivf_flat_search` reports its one-time index
  * build (KMeans + index write) as a separate `ivf_flat_build` entry so
  * per-query search time isn't dominated by KMeans convergence variance.
  * Order is fixed, and a failing query records an "errors" entry instead
  * of a fake time.
  */
object Bench {
  /** Fixed benchmark order: analytics headliners first (round-over-round
    * comparability with r1), then the heaviest new operators. New keys are
    * only ever APPENDED so earlier entries stay comparable across rounds. */
  val headliners: Seq[String] = Seq(
    "q1_pricing", "q3_top_orders", "q5_region_rev", "q_window_topsupp",
    "q_events_sessions", "q_asof_orders",
    "knn_cosine", "knn_filtered", "ivf_flat_search",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "text_quality", "text_langid", "pipeline_clean",
    "lance_roundtrip", "lance_agg_pushdown",
    // appended r6
    "ivf_pq_search", "mm_frame_sample", "q_stream_sessions",
    // appended r9
    "knn_join", "text_chunk", "text_crossdup",
    // appended r10
    "dedup_canonical", "sample_token_budget",
    // appended r11
    "dedup_substring", "text_commonness", "sample_temperature",
    "corpus_stats", "knn_negatives",
    // appended r13
    "q_events_retention", "sample_stratified", "q_events_dau",
    // appended r14
    "text_tokens_bpe", "knn_hamming", "text_keywords", "text_lm_score",
    "q_events_anomaly",
    // appended r14 second half
    "q6_forecast", "q_rollup_pricing", "q_stream_join",
    "text_quality_classifier", "bpe_train", "pipeline_pretrain",
    "q_events_topk", "mm_image_dedup", "q_cdc_materialized",
    // appended r15
    "text_search_bm25", "text_search_indexed", "mm_video_frames",
    "q_stream_text_index", "emb_project", "q_events_dau_hll",
    "q_stream_dau_hll", "sample_cluster_balanced", "q_stream_mv_window",
    "mm_video_dedup", "q_stream_image_dedup", "sample_topk_uniform",
    "sample_weighted", "sample_weighted_budget", "pipeline_curate",
    // appended r16
    "mm_video_dedup_shingle", "mm_audio_dedup", "q_stream_audio_dedup",
    "mm_audio_dedup_trim",
    // K=3 disjoint query batches from ONE standing text index — the
    // recorded time / 3 is the per-batch marginal serving cost the
    // standing index amortizes to (build is charged to the memoized
    // first use under text_search_indexed, never here)
    "text_search_indexed_multi",
    // appended late r16: the decontamination family
    "text_contamination_ratio", "contamination_semantic",
    "q_stream_contamination",
    // appended late r16: the quantization ladder's middle rung + the
    // decontamination family's SQL entry point
    "ivf_sq_search", "lance_decontaminate")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // optional comma-separated key filter for targeted local iteration
    // (SPARK_GRAFT_BENCH_KEYS=dedup_ngram_jaccard sbt "runMain graft.Bench")
    val only = sys.env.get("SPARK_GRAFT_BENCH_KEYS").map(_.split(",").toSet)
    val keys = headliners.filter(qs.contains).filter(k => only.forall(_.contains(k)))
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // Host-noise guard: medians start from `runs` samples and keep
    // sampling (up to MaxRuns) while the relative spread (max−min)/median
    // exceeds SpreadBound — a noisy neighbor or GC burst can no longer
    // swing a key's recorded time by the 1.6× r14 saw on unchanged code
    // without the artifact showing it. The residual spread is RECORDED
    // per key ("noise" in the JSON): a cross-round comparison should
    // trust a delta only when it clears both keys' noise bands.
    val SpreadBound = 0.30
    val MaxRuns = 6
    val noise = scala.collection.mutable.LinkedHashMap[String, Double]()
    def spreadOf(ts: Seq[Double]): Double = {
      val m = ts.sorted.apply(ts.length / 2)
      if (m <= 0) 0.0 else (ts.max - ts.min) / m
    }
    def medianMeasured(runs: Int)(body: () => Unit): (Double, Double) = {
      var ts = List.fill(runs) {
        val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
      }
      while (spreadOf(ts) > SpreadBound && ts.length < MaxRuns) {
        val t0 = System.nanoTime(); body()
        ts = ((System.nanoTime() - t0) / 1e9) :: ts
      }
      (ts.sorted.apply(ts.length / 2), spreadOf(ts))
    }
    def medianOf(runs: Int)(body: () => Unit): Double = medianMeasured(runs)(body)._1

    keys.foreach { name =>
      val fn = qs(name)
      try {
        val body: () => Unit = name match {
          case "ivf_flat_search" =>
            // index build is a one-time cost: report it once, separately
            val tb = System.nanoTime()
            val (root, centroids) = operators.VectorIndex.buildIvfFlat(spark, sfDir)
            times("ivf_flat_build") = (System.nanoTime() - tb) / 1e9
            val qv = operators.VectorIndex.embeddingOf(spark, sfDir, operators.VectorIndex.QueryVecId)
            () => { operators.VectorIndex.ivfSearch(spark, root, centroids, qv,
              nprobes = operators.VectorIndex.Cells, k = operators.VectorIndex.K,
              excludeVecId = operators.VectorIndex.QueryVecId).count(); () }
          case "dedup_minhash_lsh" =>
            // the verified pair set is computed ONCE per session and shared
            // by clusters/canonical/split/pipeline (Dedup.lshPairs memo) —
            // report that one-time cost separately, like ivf_flat_build,
            // so the per-query time reflects what repeat consumers pay
            val tb = System.nanoTime()
            operators.Dedup.lshPairs(spark, sfDir).count()
            times("lsh_pairs_build") = (System.nanoTime() - tb) / 1e9
            () => { fn(spark, sfDir).count(); () }
          case "ivf_pq_search" =>
            // codebook training + encode is the build; time the ADC query
            val tb = System.nanoTime()
            val (encoded, flat, subDim) = operators.VectorIndex.buildPq(spark, sfDir)
            val cached = encoded.cache()
            cached.count() // materialize codes — the persisted index artifact
            times("ivf_pq_build") = (System.nanoTime() - tb) / 1e9
            val qv = operators.VectorIndex.embeddingOf(spark, sfDir, operators.VectorIndex.QueryVecId)
            val lut = operators.VectorIndex.pqLut(qv, flat, subDim)
            () => { operators.VectorIndex.pqAdcTopK(cached, lut, k = 10,
              excludeVecId = operators.VectorIndex.QueryVecId).count(); () }
          case "ivf_sq_search" =>
            // stats pass + encode is the build; time the ADC+refine query
            val tb = System.nanoTime()
            val (encoded, mins, scales) = operators.VectorIndex.buildSq(spark, sfDir)
            val cached = encoded.cache()
            cached.count() // materialize codes — the persisted index artifact
            times("ivf_sq_build") = (System.nanoTime() - tb) / 1e9
            val qv = operators.VectorIndex.embeddingOf(spark, sfDir, operators.VectorIndex.QueryVecId)
            () => { operators.VectorIndex.sqTopKRefined(spark, cached, mins, scales,
              qv, k = operators.VectorIndex.K, refineFactor = 4,
              excludeVecId = operators.VectorIndex.QueryVecId).count(); () }
          case _ =>
            () => { fn(spark, sfDir).count(); () }
        }
        body() // warmup: JIT + codegen cache + FS cache
        val (med, spread) = medianMeasured(3)(body)
        times(name) = med
        noise(name) = math.rint(spread * 1000) / 1000
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          times(name) = -1.0
      }
    }
    // SPACED recheck: re-measure map-only keys at the END of the run, far
    // from their first slot — if the two medians disagree the first was
    // bench-order/GC noise, not a plan change (r14's text_quality 3.2×
    // question). Recorded as "<key>__spaced" so the primary series stays
    // comparable.
    Seq("text_quality", "text_langid").foreach { name =>
      if (times.contains(name) && times(name) >= 0)
        times(s"${name}__spaced") =
          medianOf(3)(() => { qs(name)(spark, sfDir).count(); () })
    }
    val qJson = times.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val eJson = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val nJson = noise.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    // __spaced rechecks are diagnostics, not workload — keep the total
    // series comparable across rounds by excluding them
    val total = times.collect { case (k, v) if v >= 0 && !k.endsWith("__spaced") => v }.sum
    // comparability flags travel IN the artifact (not just SURVEY) so a
    // cross-round diff of the bench JSON alone can't misread a split metric
    val notes =
      """{"dedup_minhash_lsh":"since r13 the one-time minhash+verify build is charged to lsh_pairs_build; per-query time here is the memoized-pair consumer cost and is not comparable to r12 and earlier",""" +
      """"dedup_ngram_jaccard":"PLAN CHANGED r15: candidate signature moved from 126-hash MinHash to one-permutation hashing (1 hash/gram + densification); output identical (exact verify decides), expect large speedup vs r14's 6.7 s",""" +
      """"__spaced":"keys suffixed __spaced are the same query re-measured at the end of the run; a first-slot/spaced disagreement marks bench-order noise, not a plan change"}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"errors":$eJson,"noise":$nJson,"notes":$notes,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("/tmp/graft_bench.json"), line)
    // also persist into the repo itself (sbt runs from the project root):
    // the driver's BENCH_r{N} capture is a truncated stdout tail — r15's
    // artifact lost the first ~25 keys and parsed as null — so the full
    // per-key record must live in a file the driver can snapshot whole.
    // FULL runs only: a key-filtered local iteration must not clobber the
    // repo's full snapshot with a partial one (/tmp still carries it)
    if (only.isEmpty)
      try Files.writeString(Paths.get("BENCH.json"), line)
      catch { case scala.util.control.NonFatal(_) => () } // read-only cwd: stdout+tmp still carry it
    println(line)
    spark.stop()
  }
}
