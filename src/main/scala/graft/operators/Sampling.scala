package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus subsetting for training-data pipelines — the selection steps that
  * run after cleaning/dedup and before tokenization:
  *
  *  - `sample_hash`: deterministic hash-bucketed train/validation/test
  *    split. Splits must be REPRODUCIBLE across engines and runs (no RNG,
  *    no partition-order dependence), stable under corpus growth (a doc's
  *    split never changes when neighbors are added), and cheap (map-only).
  *    A double round of the MINSTD multiplicative congruential step
  *    decorrelates the id from its bucket using only overflow-safe 64-bit
  *    arithmetic, so DuckDB (which raises on BIGINT overflow rather than
  *    wrapping) computes the identical value — the property the oracle
  *    gate checks.
  *  - `sample_token_budget`: per-source token-budget selection — every
  *    source contributes its highest-quality documents until the source's
  *    token budget is exhausted (the composition of a per-domain quota
  *    with a token-count target that web-scale corpus recipes apply).
  *    One shuffle on `source`; the running sum is a prefix-sum window
  *    within each source partition.
  *
  * Scale posture: sample_hash is a pure projection (no shuffle, survives
  * any corpus size); sample_token_budget shuffles each source's rows to
  * one window partition — sources are the unit of parallelism, and a
  * pathologically hot source degrades to one task's sort, the same bound
  * as text_source_cap (no cross-source state).
  */
object Sampling extends QueryModule {
  import Tables._

  // ---- sample_hash -------------------------------------------------------
  // MINSTD (Lehmer) step: h -> h * 48271 mod (2^31 - 1). Two rounds give
  // bucket uniformity good enough for split assignment; every intermediate
  // stays far below 2^63 for any doc_id < 1.9e14, so the arithmetic is
  // portable to engines that refuse to wrap on overflow.
  private[graft] val MinstdA = 48271L
  private[graft] val MinstdM = 2147483647L // 2^31 - 1
  private[graft] val TrainPct = 90
  private[graft] val ValPct = 95 // [90, 95) validation, [95, 100) test

  private[graft] def minstd2(c: Column): Column = {
    val h1 = (c * MinstdA) % MinstdM
    (h1 * MinstdA) % MinstdM
  }

  /** (pct, split) columns for the MINSTD hash split given an id column and
    * the CUMULATIVE percent boundaries ([0,trainBound) train,
    * [trainBound,valBound) validation, rest test) — factored so
    * `CALL system.split` parameterizes the same arithmetic (r20). */
  private[graft] def splitColumns(id: Column, trainBound: Int,
                                  valBound: Int): (Column, Column) = {
    val pct = minstd2(id) % 100
    (pct,
      when(pct < trainBound, "train")
        .when(pct < valBound, "validation")
        .otherwise("test"))
  }

  private def sampleHash(s: SparkSession, dir: String): DataFrame = {
    val (pct, split) = splitColumns(col("doc_id"), TrainPct, ValPct)
    t(s, dir, "documents").select(
      col("doc_id"), pct.as("pct"), split.as("split"))
      .orderBy("doc_id")
  }

  // ---- sample_token_budget -----------------------------------------------
  private[graft] val TokenBudget = 800L

  private def sampleTokenBudget(s: SparkSession, dir: String): DataFrame =
    tokenBudgetOver(t(s, dir, "documents"), TokenBudget)

  /** Per-source quality-ordered token budget over an arbitrary (doc_id,
    * source, text) frame — the gated key's machinery, factored so
    * `CALL system.sample` serves procedure inputs through the same plan
    * (r20). One (source) shuffle + prefix-sum window. */
  private[graft] def tokenBudgetOver(docs: DataFrame, budget: Long): DataFrame = {
    val d = docs.withColumn("w", TextAnalysis.tokens)
    val scored = d.select(
      col("doc_id"), col("source"),
      size(col("w")).cast("long").as("n_tokens"),
      // the ROUNDED score orders selection (ties by doc_id) so Spark and
      // the oracle rank identically despite last-bit fp differences
      round(TextAnalysis.qualityScore, 6).as("quality"))
    val byQuality = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id").asc)
    scored
      .withColumn("cum_tokens",
        sum("n_tokens").over(byQuality.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= budget)
      .select("source", "doc_id", "quality", "n_tokens", "cum_tokens")
      .orderBy("source", "cum_tokens", "doc_id")
  }

  // ---- sample_token_budget_bpe -------------------------------------------
  // The REAL-tokenizer form of the per-source token budget: identical
  // recipe, but the budget counts actual byte-level-BPE subword tokens
  // (graft.functions.Bpe) — what production corpus budgets are defined
  // in; whitespace counts skew them 1.3-1.7× with language bias. The
  // budget is the SAME 800 tokens as the whitespace key — measured in
  // real subword tokens it selects a visibly different (smaller-text)
  // prefix, exactly the skew the whitespace proxy hides. No SQL engine
  // runs BPE → rows-only gated key,
  // pinned by an equivalence spec vs the driver-side Bpe.encode
  // reference. Same scale shape: one (source) shuffle, prefix-sum window.
  private[graft] val TokenBudgetBpe = 800L

  private def sampleTokenBudgetBpe(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").withColumn("w", TextAnalysis.tokens)
    val scored = d.select(
      col("doc_id"), col("source"),
      graft.functions.bpe_stats(col("text")).getItem(0).as("n_tokens"),
      round(TextAnalysis.qualityScore, 6).as("quality"))
    val byQuality = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id").asc)
    scored
      .withColumn("cum_tokens",
        sum("n_tokens").over(byQuality.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= TokenBudgetBpe)
      .select("source", "doc_id", "quality", "n_tokens", "cum_tokens")
      .orderBy("source", "cum_tokens", "doc_id")
  }

  // ---- sample_mixture ----------------------------------------------------
  // Mixture-weighted corpus composition — the step that turns "we want
  // 35% src0 / 25% src1 / ..." into an actual document selection. Given
  // target weights, the largest corpus achievable WITHOUT upsampling is
  // N = min_s(T_s / w_s) total tokens (the scarcest source relative to its
  // share binds); each source then contributes up to floor(w_s * N) tokens,
  // docs chosen in deterministic-hash order (minstd2 — an unbiased sample,
  // unlike the quality-ranked token_budget) with doc_id tiebreak. Scale
  // shape: per-source totals are one partial-agg'd groupBy to ~|sources|
  // rows; the binding minimum is a 1-row broadcast cross join (never a
  // driver collect); selection is the same one-shuffle prefix-sum window
  // as sample_token_budget — sources are the unit of parallelism. All
  // arithmetic is integer-weight percent + IEEE double division, so DuckDB
  // computes bit-identical budgets.
  private[graft] val MixturePct: Seq[(String, Int)] =
    Seq("src0" -> 35, "src1" -> 25, "src2" -> 20, "src3" -> 15, "src4" -> 5)

  private def sampleMixture(s: SparkSession, dir: String): DataFrame =
    mixtureOver(t(s, dir, "documents"), MixturePct)

  /** Share-targeted mixture selection (no upsampling, scarcest source
    * binds the total) over an arbitrary (doc_id, source, text) frame —
    * the gated key's machinery, factored for `CALL system.sample` (r20).
    * All-integer budgets; |sources|-row broadcast; one prefix-sum window. */
  private[graft] def mixtureOver(docs: DataFrame,
                                 shares: Seq[(String, Int)]): DataFrame = {
    val pctCol = shares.foldLeft(lit(null).cast("int")) { case (acc, (src, p)) =>
      when(col("source") === src, lit(p)).otherwise(acc)
    }
    val d = docs
      .withColumn("pct", pctCol)
      .filter(col("pct").isNotNull) // sources outside the mixture contribute nothing
      .select(col("doc_id"), col("source"), col("pct"),
        size(TextAnalysis.tokens).cast("long").as("n_tokens"))
    val binding = d.groupBy("source", "pct")
      .agg(sum("n_tokens").as("t_s"))
      .agg(min(col("t_s").cast("double") * 100.0 / col("pct")).as("n_total"))
    val bySel = Window.partitionBy("source")
      .orderBy(col("h").asc, col("doc_id").asc)
    d.crossJoin(broadcast(binding))
      .withColumn("budget", floor(col("pct") * col("n_total") / 100.0).cast("long"))
      .withColumn("h", minstd2(col("doc_id")))
      .withColumn("cum_tokens",
        sum("n_tokens").over(bySel.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= col("budget"))
      .select("source", "doc_id", "n_tokens", "cum_tokens", "budget")
      .orderBy("source", "cum_tokens", "doc_id")
  }

  // ---- sample_temperature ------------------------------------------------
  // Temperature-flattened source weighting (the mT5/XLM-R multilingual
  // recipe): source s gets budget ∝ T_s^α with α = 1/2, boosting scarce
  // sources relative to proportional sampling without letting any giant
  // source dominate. Cross-engine determinism is the trap here — α≠1 needs
  // a real power, and pow/exp differ in the last ulp across libms, which a
  // floor() then amplifies into a row flip. α = 1/2 dodges it exactly:
  // IEEE-754 sqrt is CORRECTLY rounded everywhere, and rounding the root
  // to BIGINT makes the denominator an integer sum (order-independent,
  // unlike a float sum reduced in shuffle order) — budgets come out of
  // pure integer multiply/divide, bit-identical in any engine.
  // Scale shape = sample_mixture's: per-source totals partial-agg to
  // |sources| rows, the 1-row denominator broadcasts (never a driver
  // collect), selection is one prefix-sum window per source partition.
  private[graft] val TempBudget = 6000L

  private def sampleTemperature(s: SparkSession, dir: String): DataFrame =
    temperatureOver(t(s, dir, "documents"), TempBudget)

  /** T^(1/2) temperature-flattened selection over an arbitrary (doc_id,
    * source, text) frame — the gated key's machinery, factored for
    * `CALL system.sample` (r20); same IEEE-sqrt + integer-denominator
    * determinism argument as the gated key's header. */
  private[graft] def temperatureOver(docs: DataFrame, budget: Long): DataFrame = {
    val d = docs
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens).cast("long").as("n_tokens"))
    val roots = d.groupBy("source")
      .agg(round(sqrt(sum("n_tokens").cast("double"))).cast("long").as("r_s"))
    val denom = roots.agg(sum("r_s").as("r_sum"))
    val bySel = Window.partitionBy("source")
      .orderBy(col("h").asc, col("doc_id").asc)
    d.join(roots, "source").crossJoin(broadcast(denom))
      .withColumn("budget", expr(s"r_s * $budget div r_sum"))
      .withColumn("h", minstd2(col("doc_id")))
      .withColumn("cum_tokens",
        sum("n_tokens").over(bySel.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= col("budget"))
      .select("source", "doc_id", "n_tokens", "cum_tokens", "budget")
      .orderBy("source", "cum_tokens", "doc_id")
  }

  // ---- sample_epochs -----------------------------------------------------
  // Mixture composition WITH upsampling — what sample_mixture forbids: when
  // a scarce source can't fill its share from one pass, repeat it for up to
  // MaxEpochs passes (the LLaMA/DoReMi recipe detail: low-resource sources
  // run multiple epochs, never unboundedly). Selection cycles the source in
  // deterministic hash order — epoch-major, so every doc appears once
  // before any doc appears twice — and stops at the token budget or the
  // epoch cap, whichever binds. All-integer budget/epoch arithmetic.
  // Scale shape: the epoch fan-out is a map-side explode bounded by
  // MaxEpochs; per-source budgets/epoch counts are a |sources|-row
  // broadcast; selection is the one source-keyed prefix-sum window.
  private[graft] val EpochTotal = 12000L
  private[graft] val MaxEpochs = 4L

  private def sampleEpochs(s: SparkSession, dir: String): DataFrame =
    epochsOver(t(s, dir, "documents"), MixturePct, EpochTotal, MaxEpochs)

  /** Mixture composition WITH bounded upsampling over an arbitrary
    * (doc_id, source, text) frame — the gated key's machinery, factored
    * for `CALL system.sample(method => 'epochs')` (r20). All-integer
    * budget/epoch arithmetic; epoch-major cycling; the fan-out is a
    * map-side explode bounded by `maxEpochs`. */
  private[graft] def epochsOver(docs: DataFrame, shares: Seq[(String, Int)],
                                total: Long, maxEpochs: Long): DataFrame = {
    val pctCol = shares.foldLeft(lit(null).cast("int")) { case (acc, (src, p)) =>
      when(col("source") === src, lit(p)).otherwise(acc)
    }
    val d = docs
      .withColumn("pct", pctCol)
      .filter(col("pct").isNotNull)
      .select(col("doc_id"), col("source"), col("pct"),
        size(TextAnalysis.tokens).cast("long").as("n_tokens"))
    val tot = d.groupBy("source", "pct").agg(sum("n_tokens").as("t_s"))
      .withColumn("budget", expr(s"pct * ${total}L div 100L"))
      .withColumn("n_epochs",
        least(lit(maxEpochs), expr("(budget + t_s - 1L) div t_s")))
      .select("source", "budget", "n_epochs")
    val byS = Window.partitionBy("source")
      .orderBy(col("epoch").asc, col("h").asc, col("doc_id").asc)
    d.join(broadcast(tot), "source")
      .withColumn("epoch", explode(expr("sequence(1L, n_epochs)")))
      .withColumn("h", minstd2(col("doc_id")))
      .withColumn("cum_tokens",
        sum("n_tokens").over(byS.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= col("budget"))
      .select("source", "epoch", "doc_id", "n_tokens", "cum_tokens", "budget")
      .orderBy("source", "epoch", "cum_tokens", "doc_id")
  }

  // ---- sample_split_leakfree ---------------------------------------------
  // CLUSTER-CONSISTENT train/validation/test split — the leak sample_hash
  // cannot prevent: two near-duplicate documents hashed independently can
  // land on opposite sides of the fence, quietly moving test content into
  // training. Here the whole near-dup cluster rides ONE side: every doc
  // maps to its component's min-id representative (unclustered docs are
  // their own rep) and the rep's hash decides the split. Scale shape =
  // dedup_canonical's: the component labels cover only pair-docs — a tiny
  // slice of the corpus — so the rep lookup is a broadcast left join over
  // an otherwise map-only projection; the split stays reproducible,
  // growth-stable, and engine-portable like sample_hash.
  private def sampleSplitLeakfree(s: SparkSession, dir: String): DataFrame =
    leakfreeRepOver(t(s, dir, "documents").select(col("doc_id")),
        Dedup.lshPairs(s, dir).select("a_id", "b_id"))
      .transform { reps =>
        val (pct, split) = splitColumns(col("rep_id"), TrainPct, ValPct)
        reps.select(col("doc_id"), col("rep_id"), pct.as("pct"),
          split.as("split"))
      }
      .orderBy("doc_id")

  /** (doc_id, rep_id) cluster representatives over a near-dup pair set —
    * every doc maps to its component's min-id rep (unclustered docs are
    * their own rep); the broadcast-left-join shape of the gated key,
    * factored so `CALL system.split` rides any (doc_id) frame + pair
    * source (r20). */
  private[graft] def leakfreeRepOver(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = Dedup.closeLabelsAdaptive(ids.sparkSession, pairs)
    ids.select(col("doc_id"))
      .join(broadcast(labels.select(col("node").as("doc_id"), col("lbl"))),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("rep_id"))
  }

  // ---- sample_stratified -------------------------------------------------
  // Exact-allocation stratified sampling: floor(1/5) of every language
  // stratum, members chosen in deterministic minstd2-hash order (unbiased,
  // reproducible, growth-stable — a doc keeps or loses its slot only when
  // its stratum's size crosses a multiple of 5). All-integer admission
  // (rk * 5 <= n_lang) so DuckDB reproduces bit-identically — no
  // float-fraction ceil to disagree on. Scale shape: one shuffle on the
  // stratum key for the rank window + a count window over the same
  // partitioning; strata are the unit of parallelism.
  private val StratDen = 5L // sample 1/5 of each stratum

  private def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
    val byRank = byLang.orderBy(col("h").asc, col("doc_id").asc)
    t(s, dir, "documents").select(col("doc_id"), col("lang"))
      .withColumn("h", minstd2(col("doc_id")))
      .withColumn("rk", row_number().over(byRank).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(byLang))
      .filter(col("rk") * StratDen <= col("n_lang"))
      .select("lang", "doc_id", "rk", "n_lang")
      .orderBy("lang", "rk")
  }

  // ---- sample_cluster_balanced -------------------------------------------
  // Cluster-balanced curation sampling over the EMBEDDING space (the
  // SSL-curation / SemDeDup-family selection): KMeans the corpus into
  // ClusterCells cells, keep the ClusterQuota most PROTOTYPICAL vectors
  // per cell (ascending distance to the cell centroid, vec_id tiebreak).
  // A web-scale corpus is dominated by its head clusters; per-cluster
  // quotas keep tail concepts represented while bounding the head — the
  // diversity lever token budgets and source caps can't express. Scale
  // shape: KMeans trains on a capped sample (same recipe as the IVF
  // builds), assignment + centroid distance are one codegen'd map stage
  // over literal centroids, and the per-cell top-k rank rewrites to a
  // pre-shuffle k-heap (InferWindowGroupLimit) on the one (cell) shuffle.
  private val ClusterCells = 16
  private val ClusterQuota = 40

  private def sampleClusterBalanced(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val e = t(s, dir, "embeddings")
      .withColumn("fv", VectorIndex.asVec(col("embedding")))
    val model = new KMeans().setK(ClusterCells).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(VectorIndex.trainingSample(e))
    val centroids = model.clusterCenters.map(_.toArray.toSeq)
    val byCell = Window.partitionBy("cell")
      .orderBy(col("dist").asc, col("vec_id").asc)
    model.transform(e)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        round(graft.functions.vec_l2(col("embedding"),
          element_at(typedLit(centroids), col("cell") + 1)), 6).as("dist"))
      .withColumn("rk", row_number().over(byCell).cast("long"))
      .filter(col("rk") <= ClusterQuota)
      .select("cell", "rk", "vec_id", "dist")
      .orderBy("cell", "rk")
  }

  // ---- sample_topk_uniform -----------------------------------------------
  // Exactly-K deterministic uniform sample — the distributed replacement
  // for reservoir sampling: rank every row by the decorrelated MINSTD hash
  // of its id and keep the K smallest. Same selection on any engine (pure
  // integer arithmetic, no RNG), per-doc stable (a doc's hash never
  // changes — corpus growth or shrinkage only swaps boundary members, it
  // never reshuffles the rest), and ONE pass at any scale: Spark plans
  // TakeOrderedAndProject — per-partition K-heaps merged on the driver
  // (#partitions × K rows), no global sort, no COUNT(*) pre-pass, no
  // second scan — where classic reservoir sampling serializes on a single
  // reader. The minstd2 map is a bijection on [1, 2^31-2], so hashes are
  // collision-free over the id domain and the selection needs no
  // tiebreak beyond doc_id.
  private val SampleK = 120

  private def sampleTopkUniform(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), minstd2(col("doc_id")).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(SampleK)
      .orderBy("doc_id")

  // ---- sample_weighted ---------------------------------------------------
  // Weight-proportional sampling WITHOUT replacement (Efraimidis–Spirakis
  // priority sampling): E-S ranks docs by u^(1/w) descending, and
  // u^(1/w) is distributed EXACTLY as the maximum of w independent
  // uniforms — so the key here IS that maximum, computed as w integer
  // MINSTD draws g(doc_id, j), j = 1..w. All-integer arithmetic: no
  // ln/pow (libm functions are not IEEE-bit-specified across engines —
  // the hazard every other selection key in this module engineers out),
  // no u = 1.0 edge, no float rounding at the selection boundary. Cost
  // is O(w) per doc — the same O(text) the n_tokens computation itself
  // pays, so the scale posture is unchanged (one map pass +
  // TakeOrderedAndProject). The K LARGEST keys win; doc_id breaks the
  // (rare, 31-bit-space) ties deterministically.
  private val WeightedK = 100

  /** The integer Efraimidis–Spirakis key: max of `w` MINSTD draws seeded
    * by (minstd2(id) + j) % M — the ONE definition all three weighted
    * selections and their DuckDB oracles share (see [[weightedKeySql]]).
    * Computed by the native loop [[graft.functions.MaxMinstdDraws]]
    * (bit-identical draws; the former `transform(sequence(1, w))` form
    * allocated a w-element array per row — ~800 KB transient for a
    * 100k-token document — where the loop keeps 8 bytes of state). */
  private[graft] def weightedKey(id: Column, w: Column): Column =
    graft.functions.max_minstd_draws(id, w)

  /** The DuckDB twin of [[weightedKey]] over SQL fragments `id` / `w`. */
  private[graft] def weightedKeySql(id: String, w: String): String =
    s"list_max(list_transform(range(1, $w + 1), j -> " +
      s"((((($id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM + j) % $MinstdM" +
      s" * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM))"

  private def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("k", weightedKey(col("doc_id"), col("n_tokens")))
      .orderBy(col("k").desc, col("doc_id").asc)
      .limit(WeightedK)
      .orderBy("doc_id")

  // ---- sample_weighted_budget --------------------------------------------
  // The full mixture-construction primitive: sample_weighted's
  // exponential clocks COMPOSED with sample_token_budget's per-source
  // windows — each source admits docs in clock order (an unbiased
  // token-mass-weighted draw, unlike token_budget's quality-greedy
  // ranking) until its token budget fills. Same scale shape as every
  // budget key: one (source) shuffle + a prefix-sum window; sources are
  // the unit of parallelism.
  private val WeightedBudget = 700L

  private def sampleWeightedBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("k", weightedKey(col("doc_id"), col("n_tokens")))
    val byClock = Window.partitionBy("source")
      .orderBy(col("k").desc, col("doc_id").asc)
    d.withColumn("cum_tokens",
        sum("n_tokens").over(byClock.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") <= WeightedBudget)
      .select("source", "doc_id", "n_tokens", "k", "cum_tokens")
      .orderBy("source", "cum_tokens", "doc_id")
  }

  // ---- sample_dsir ---------------------------------------------------------
  // DSIR-style data selection (Xie et al. 2023, "Data Selection for
  // Language Models via Importance Resampling"): featurize every document
  // as hashed word uni+bigram counts over B = DsirHash.Buckets buckets,
  // fit two bag-of-buckets distributions — p̂_target on the TARGET slice
  // (here lang = 'en': the reference distribution a pretraining recipe
  // wants more of) and p̂_raw on the selection POOL (everything else) —
  // and score each pool document by its importance log-ratio
  // Σ_gram (ln p̂_target[h(gram)] − ln p̂_raw[h(gram)]) with add-1
  // smoothing; the top-K pool documents by that ratio are the selection
  // (the paper's no-noise Top-K operating mode — the Gumbel-perturbed
  // resample adds ln() of per-doc uniforms, which is not bit-specified
  // across engines; see sample_weighted for the repo's exact
  // integer-clock weighted draw).
  //
  // Scale shape (the reason DSIR is THE cheap neural-free selector at
  // 100 TB): training is ONE explode → groupBy(bucket) aggregation whose
  // result is B-bounded BY CONSTRUCTION (the collect is ≤ 1024 rows
  // regardless of corpus size; map-side partials make the shuffle
  // ≤ B × partitions rows); scoring is a pure codegen'd map expression
  // (the λ table rides the plan as a 8 KB reference array — zero joins,
  // zero shuffles) followed by a TakeOrderedAndProject k-heap. In
  // production the target counts come from the small reference corpus and
  // the raw counts from a pool sample; both are broadcast-sized always.
  //
  // Determinism: bucket counts are exact integers in any engine (the
  // rolling-hash featurization is the proven text_fingerprint
  // polynomial); the ONE non-SQL step is ln(), so the trained λ vector
  // (integer micro-nats, computed on the driver with StrictMath.log —
  // fdlibm, bit-specified across JVMs) is RECORDED by the run and the
  // oracle re-derives featurization → per-doc Σ → ranking → selection
  // from the λ literals independently (the dedup_semantic_trained
  // lazily-armed mechanism; Verify dumps oracle_sql.json after the query
  // pass). The same posture as text_lm_score's: log() is not
  // bit-specified across engines, so it never crosses the engine
  // boundary.
  private[graft] val DsirK = 100
  private[graft] val DsirTargetLang = "en"

  private[graft] object DsirOracle {
    // keyed like Dedup.TrainedSemOracle: each gated key's RUN records its
    // own trained λ, so a filtered Verify invocation arms exactly the
    // entries whose queries executed (λ is a pure function of the corpus,
    // so the gate keys — all over the same documents table — record
    // identical vectors)
    private val recorded =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    def record(key: String, l: Array[Long]): Unit = recorded.put(key, l)

    /** The shared featurize→score CTE chain over the λ literals: ends in
      * `sel(doc_id, source, n_grams, dsir_micro)` = the selected top-K. */
    private def bodyCtes(l: Array[Long]): String = {
      val lamList = l.mkString("[", ", ", "]")
      s"""WITH l AS (SELECT $lamList AS lam),
         |d AS (SELECT doc_id, source, lang, $wSql AS w FROM documents),
         |g AS (SELECT doc_id, source, lang,
         |  list_concat(w, list_transform(range(1, len(w)),
         |    i -> w[i] || ' ' || w[i + 1])) AS grams
         |  FROM d WHERE len(w) >= 1),
         |b AS (SELECT doc_id, source, lang,
         |  list_transform(grams, gg -> CAST(list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, length(gg) + 1),
         |        i -> CAST(ascii(gg[i:i]) AS BIGINT))),
         |    (h, c) -> (h * 31 + c) % 1000000007) % 1024 AS INT)) AS hs
         |  FROM g),
         |sc AS (SELECT doc_id, source,
         |    CAST(len(hs) AS BIGINT) AS n_grams,
         |    CAST(list_sum(list_transform(hs, h -> lam[h + 1])) AS BIGINT)
         |      AS dsir_micro
         |  FROM b, l WHERE lang != '$DsirTargetLang'),
         |sel AS (SELECT doc_id, source, n_grams, dsir_micro FROM sc
         |  ORDER BY dsir_micro DESC, doc_id ASC LIMIT $DsirK)""".stripMargin
    }

    /** The (doc_id, source, n_grams, dsir_micro) selection — the batch
      * key's and the streaming MV's gate statement. */
    def entry(key: String): Option[String] = Option(recorded.get(key)).map {
      l => bodyCtes(l) + "\nSELECT * FROM sel ORDER BY doc_id"
    }

    /** The whole-row materialization — CALL system.dsir's gate statement
      * (the procedure writes every corpus column of the selected docs). */
    def entryFullRows(key: String): Option[String] = Option(recorded.get(key)).map {
      l => bodyCtes(l) +
        "\nSELECT dd.* FROM documents dd JOIN sel USING (doc_id) ORDER BY doc_id"
    }
  }

  /** The DSIR training pass — one explode → groupBy(bucket) over the
    * corpus, B-bounded collect, λ in integer micro-nats (driver-side
    * StrictMath.log). ONE definition for the batch key, the streaming
    * selection MV (which freezes λ BEFORE the stream — the
    * q_stream_index_once posture) and the Gumbel resample mode. */
  /** Train λ over ANY corpus slice + target predicate — the procedure
    * surface's form (CALL system.dsir takes the predicate as SQL). */
  private[graft] def dsirTrainOn(docs: DataFrame, isTarget: Column,
                                 textCol: Column): Array[Long] = {
    val (ct, cr) = dsirTrainCounts(docs, isTarget, textCol)
    dsirLambdaOf(ct, cr)
  }

  /** The training pass's raw per-bucket (target, pool) gram counts — the
    * sufficient statistic λ derives from, and the baseline the
    * drift-gated refresh (CALL system.dsir_refresh) compares against. */
  private[graft] def dsirTrainCounts(docs: DataFrame, isTarget: Column,
                                     textCol: Column): (Array[Long], Array[Long]) = {
    import graft.functions.DsirHash
    val counts = docs
      .select(isTarget.as("tgt"),
        explode(graft.functions.dsir_gram_buckets(textCol)).as("h"))
      .groupBy("h")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr"))
      .collect()
    val B = DsirHash.Buckets
    val ct = new Array[Long](B); val cr = new Array[Long](B)
    counts.foreach { r =>
      ct(r.getInt(0)) = r.getLong(1); cr(r.getInt(0)) = r.getLong(2)
    }
    (ct, cr)
  }

  /** λ in integer micro-nats from the two count vectors (driver-side
    * StrictMath.log over B-bounded arrays — log never crosses engines). */
  private[graft] def dsirLambdaOf(ct: Array[Long], cr: Array[Long]): Array[Long] = {
    val B = graft.functions.DsirHash.Buckets
    val totT = ct.sum; val totR = cr.sum
    Array.tabulate(B) { h =>
      math.round(1e6 * (StrictMath.log((ct(h) + 1.0) / (totT + B))
        - StrictMath.log((cr(h) + 1.0) / (totR + B))))
    }
  }

  /** χ² between two bucket-count vectors with EXACTLY the drift family's
    * arithmetic (add-1/(tot+B) smoothing, per-bucket terms rounded to
    * integer nano-units before the sum — [[TextAnalysis.driftPair]]'s
    * tail on the driver): the number the dsir refresh gate thresholds. */
  private[graft] def dsirChi2(oldC: Array[Long], newC: Array[Long]): Double = {
    val B = graft.functions.DsirHash.Buckets
    val totO = oldC.sum.toDouble + B; val totN = newC.sum.toDouble + B
    var nano = 0L
    var h = 0
    while (h < B) {
      val po = (oldC(h) + 1.0) / totO
      val pn = (newC(h) + 1.0) / totN
      nano += math.round((pn - po) * (pn - po) / po * 1e9)
      h += 1
    }
    nano / 1e9
  }

  private[operators] def dsirTrain(s: SparkSession, dir: String,
                                   oracleKey: String): Array[Long] = {
    val lam = dsirTrainOn(t(s, dir, "documents"),
      col("lang") === DsirTargetLang, col("text"))
    DsirOracle.record(oracleKey, lam)
    lam
  }

  /** Score a pool slice against frozen λ: the codegen'd map alone —
    * (doc_id, source, n_grams, dsir_micro) for every non-target doc with
    * at least one gram. Complete per-document, so the streaming MV can
    * score micro-batches independently. */
  private[graft] def dsirScore(docs: DataFrame, lam: Array[Long]): DataFrame = {
    val st = graft.functions.dsir_doc_score(col("text"), lam)
    docs.filter(col("lang") =!= DsirTargetLang)
      .select(col("doc_id"), col("source"),
        st.getItem(0).as("n_grams"), st.getItem(1).as("dsir_micro"))
      .filter(col("n_grams") > 0)
  }

  private def sampleDsir(s: SparkSession, dir: String): DataFrame = {
    val lam = dsirTrain(s, dir, oracleKey = "sample_dsir")
    dsirScore(t(s, dir, "documents"), lam)
      .orderBy(col("dsir_micro").desc, col("doc_id").asc)
      .limit(DsirK)
      .orderBy("doc_id")
  }

  // ---- sample_dsir_gumbel --------------------------------------------------
  // The paper's actual RESAMPLE mode: Gumbel-top-K over the importance
  // scores — add an independent Gumbel(0,1) to each doc's log-weight and
  // take the top K, which draws K docs WITHOUT replacement with
  // probability ∝ exp(score) (Gumbel-max trick; sample_dsir's plain Top-K
  // is the paper's no-noise variant). The "noise" is deterministic: u =
  // (minstd2(doc_id)+1)/(M+1) ∈ (0,1) (the repo's integer split hash), g
  // = −ln(−ln u) via StrictMath (fdlibm — bit-identical across JVMs), in
  // micro-units. ln() never crosses the engine boundary but IS
  // irreducible here (the Gumbel quantile has no rational form), so the
  // key is rows-only by design, pinned by a full driver-side recompute
  // spec. Same map-only + k-heap plan as sample_dsir.
  private def sampleDsirGumbel(s: SparkSession, dir: String): DataFrame = {
    // rows-only key — trains its own λ (no armed entry to record)
    val lam = dsirTrainOn(t(s, dir, "documents"),
      col("lang") === DsirTargetLang, col("text"))
    dsirScore(t(s, dir, "documents"), lam)
      .withColumn("gumbel_micro", graft.functions.gumbel_micro(col("doc_id")))
      .withColumn("key_micro", col("dsir_micro") + col("gumbel_micro"))
      .orderBy(col("key_micro").desc, col("doc_id").asc)
      .limit(DsirK)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_dsir" -> sampleDsir,
    "sample_dsir_gumbel" -> sampleDsirGumbel,
    "sample_stratified" -> sampleStratified,
    "sample_topk_uniform" -> sampleTopkUniform,
    "sample_weighted" -> sampleWeighted,
    "sample_weighted_budget" -> sampleWeightedBudget,
    "sample_hash" -> sampleHash,
    "sample_token_budget" -> sampleTokenBudget,
    "sample_token_budget_bpe" -> sampleTokenBudgetBpe,
    "sample_mixture" -> sampleMixture,
    "sample_temperature" -> sampleTemperature,
    "sample_epochs" -> sampleEpochs,
    "sample_split_leakfree" -> sampleSplitLeakfree,
    "sample_cluster_balanced" -> sampleClusterBalanced)

  private val wSql = """list_filter(regexp_split_to_array(text, '[\t\n\x0B\f\r ]+'), x -> x != '')"""

  // a `def`: sample_dsir's entry materializes only after the key has run
  // (its trained λ vector becomes the oracle's literals — Verify dumps
  // oracle_sql.json AFTER the query pass, so the driver always sees it)
  def oracleSql: Map[String, String] =
    DsirOracle.entry("sample_dsir").map("sample_dsir" -> _).toMap ++ Map(
    "sample_stratified" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    ((doc_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM AS h
         |  FROM documents),
         |r AS (SELECT doc_id, lang, h,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n_lang
         |  FROM d)
         |SELECT lang, doc_id, rk, n_lang FROM r
         |WHERE rk * $StratDen <= n_lang ORDER BY lang, rk""".stripMargin,
    "sample_weighted_budget" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($wSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |k AS (SELECT doc_id, source, n_tokens,
         |    ${weightedKeySql("doc_id", "n_tokens")} AS k
         |  FROM d WHERE n_tokens > 0),
         |c AS (SELECT doc_id, source, n_tokens, k,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY k DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS cum_tokens
         |  FROM k)
         |SELECT source, doc_id, n_tokens, k, cum_tokens FROM c
         |WHERE cum_tokens <= $WeightedBudget
         |ORDER BY source, cum_tokens, doc_id""".stripMargin,
    "sample_weighted" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($wSql) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, source, n_tokens, k FROM (
         |  SELECT doc_id, source, n_tokens,
         |    ${weightedKeySql("doc_id", "n_tokens")} AS k
         |  FROM d WHERE n_tokens > 0
         |  ORDER BY k DESC, doc_id ASC LIMIT $WeightedK)
         |ORDER BY doc_id""".stripMargin,
    "sample_topk_uniform" ->
      s"""SELECT doc_id, source, h FROM (
         |  SELECT doc_id, source,
         |    ((doc_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM AS h
         |  FROM documents ORDER BY h ASC, doc_id ASC LIMIT $SampleK)
         |ORDER BY doc_id""".stripMargin,
    "sample_hash" ->
      s"""WITH h AS (SELECT doc_id,
         |    ((doc_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM % 100 AS pct
         |  FROM documents)
         |SELECT doc_id, pct,
         |  CASE WHEN pct < $TrainPct THEN 'train'
         |       WHEN pct < $ValPct THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin,
    "sample_token_budget" ->
      s"""WITH d AS (SELECT doc_id, source, $wSql AS w FROM documents),
         |s AS (SELECT doc_id, source, len(w) AS n_tokens,
         |  CAST(len(w) AS DOUBLE) AS nt,
         |  CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE) AS sc,
         |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dr
         |  FROM d),
         |q AS (SELECT doc_id, source, n_tokens,
         |  round(${TextAnalysis.qualityScoreSql}, 6) AS quality FROM s),
         |c AS (SELECT source, doc_id, quality, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM q)
         |SELECT source, doc_id, quality, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens <= $TokenBudget
         |ORDER BY source, cum_tokens, doc_id""".stripMargin,
    "sample_mixture" -> {
      val pctCase = MixturePct.map { case (src, p) =>
        s"WHEN '$src' THEN $p"
      }.mkString("CASE source ", " ", " END")
      s"""WITH d AS (SELECT doc_id, source, $pctCase AS pct,
         |    CAST(len($wSql) AS BIGINT) AS n_tokens
         |  FROM documents WHERE $pctCase IS NOT NULL),
         |tot AS (SELECT source, pct, sum(n_tokens) AS t_s FROM d GROUP BY source, pct),
         |bind AS (SELECT min(CAST(t_s AS DOUBLE) * 100.0 / pct) AS n_total FROM tot),
         |sel AS (SELECT d.source, d.doc_id, d.n_tokens,
         |    CAST(floor(d.pct * bind.n_total / 100.0) AS BIGINT) AS budget,
         |    ((d.doc_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM AS h
         |  FROM d, bind),
         |c AS (SELECT source, doc_id, n_tokens, budget,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM sel)
         |SELECT source, doc_id, n_tokens, cum_tokens, budget
         |FROM c WHERE cum_tokens <= budget
         |ORDER BY source, cum_tokens, doc_id""".stripMargin
    },
    // sqrt is correctly rounded in IEEE-754, round-to-BIGINT makes the
    // denominator an order-independent integer sum, and `//` / `div`
    // integer division agree — so budgets match Spark's bit-for-bit
    "sample_temperature" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($wSql) AS BIGINT) AS n_tokens FROM documents),
         |r AS (SELECT source, CAST(round(sqrt(CAST(sum(n_tokens) AS DOUBLE)))
         |    AS BIGINT) AS r_s FROM d GROUP BY source),
         |dn AS (SELECT CAST(sum(r_s) AS BIGINT) AS r_sum FROM r),
         |sel AS (SELECT d.source, d.doc_id, d.n_tokens,
         |    CAST(r.r_s * $TempBudget // dn.r_sum AS BIGINT) AS budget,
         |    ((d.doc_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM AS h
         |  FROM d JOIN r USING (source), dn),
         |c AS (SELECT source, doc_id, n_tokens, budget,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM sel)
         |SELECT source, doc_id, n_tokens, cum_tokens, budget
         |FROM c WHERE cum_tokens <= budget
         |ORDER BY source, cum_tokens, doc_id""".stripMargin,
    "sample_epochs" -> {
      val pctCase = MixturePct.map { case (src, p) =>
        s"WHEN '$src' THEN $p"
      }.mkString("CASE source ", " ", " END")
      s"""WITH d AS (SELECT doc_id, source, $pctCase AS pct,
         |    CAST(len($wSql) AS BIGINT) AS n_tokens
         |  FROM documents WHERE $pctCase IS NOT NULL),
         |tot AS (SELECT source, pct, CAST(sum(n_tokens) AS BIGINT) AS t_s
         |  FROM d GROUP BY source, pct),
         |e AS (SELECT source, CAST(pct * $EpochTotal // 100 AS BIGINT) AS budget,
         |    least($MaxEpochs, (pct * $EpochTotal // 100 + t_s - 1) // t_s) AS n_epochs
         |  FROM tot),
         |x AS (SELECT d.source, d.doc_id, d.n_tokens, e.budget,
         |    unnest(range(1, e.n_epochs + 1)) AS epoch,
         |    ((d.doc_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM AS h
         |  FROM d JOIN e USING (source)),
         |c AS (SELECT source, epoch, doc_id, n_tokens, budget,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY epoch, h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM x)
         |SELECT source, epoch, doc_id, n_tokens, cum_tokens, budget
         |FROM c WHERE cum_tokens <= budget
         |ORDER BY source, epoch, cum_tokens, doc_id""".stripMargin
    },
    // components via the same recursive-CTE closure that gates
    // dedup_clusters; the rep's MINSTD hash then decides the whole cluster
    "sample_split_leakfree" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id, $wSql AS w FROM documents),
         |g AS (SELECT doc_id,
         |  list_distinct(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
         |  FROM d WHERE len(w) >= 3),
         |pairs AS (SELECT a_id, b_id FROM (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.8),
         |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs
         |  UNION SELECT a_id, a_id FROM pairs
         |  UNION SELECT b_id, b_id FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM edges
         |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |comp AS (SELECT a AS node, min(b) AS lbl FROM reach GROUP BY a),
         |r AS (SELECT dd.doc_id, coalesce(comp.lbl, dd.doc_id) AS rep_id
         |  FROM documents dd LEFT JOIN comp ON dd.doc_id = comp.node),
         |p AS (SELECT doc_id, rep_id,
         |    ((rep_id * $MinstdA) % $MinstdM * $MinstdA) % $MinstdM % 100 AS pct
         |  FROM r)
         |SELECT doc_id, rep_id, pct,
         |  CASE WHEN pct < $TrainPct THEN 'train'
         |       WHEN pct < $ValPct THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM p ORDER BY doc_id""".stripMargin)
}
