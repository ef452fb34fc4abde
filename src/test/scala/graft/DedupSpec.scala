package graft

import graft.functions.simhash
import org.apache.spark.sql.functions._

/** Equivalence tests for the bucketed dedup operators: the LSH/banded path
  * must reproduce the brute-force all-pairs result on sf0.001 — proving the
  * bucketing is a pure optimization, not a semantics change. */
class DedupSpec extends SparkSpec {

  private def toks = filter(split(col("text"), "\\s+"), x => x =!= "")

  test("pack derives its shard count from the cluster when unpinned") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
    val derived = graft.operators.TextAnalysis.pack(spark, docs)
    assert(derived.select(countDistinct(col("shard"))).first().getLong(0)
      === spark.sparkContext.defaultParallelism.toLong)
    // a pinned count behaves as before, and no pack undershoots its budget
    val pinned = graft.operators.TextAnalysis.pack(spark, docs, shards = 8)
    assert(pinned.select(countDistinct(col("shard"))).first().getLong(0) === 8L)
    // total docs conserved across shardings
    val total = docs.count()
    assert(derived.agg(sum("n_docs")).first().getLong(0) === total)
    assert(pinned.agg(sum("n_docs")).first().getLong(0) === total)
  }

  test("minhash LSH pairs == brute-force jaccard pairs (sf0.001)") {
    val base = Tables.t(spark, sf, "documents")
      .withColumn("sh", graft.functions.shingle_hashes(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
    val a = base.select(col("doc_id").as("a_id"), col("sh").as("sa"))
    val b = base.select(col("doc_id").as("b_id"), col("sh").as("sb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("j", graft.functions.sorted_jaccard(col("sa"), col("sb")))
      .filter(col("j") >= 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute)
  }

  test("dedup_substring: coverage == merged cross-doc duplicated runs (engineered corpus)") {
    // engineered micro-corpus, n = 8:
    //  docs 1/2 share a 12-token run  -> 12 covered in each (overlap merge)
    //  docs 3/4 share TWO disjoint runs (8 + 9 tokens) -> 17 covered in each
    //  doc 5 repeats a 10-token run only WITHIN itself -> 0 (cross-doc only)
    //  doc 6 is unique -> 0;  doc 7 has < 8 tokens -> excluded from output
    def ws(p: String, a: Int, b: Int) = (a to b).map(p + _).mkString(" ")
    val docs = Seq(
      1L -> ws("a", 1, 20),
      2L -> s"b1 b2 ${ws("a", 5, 16)} b3 b4",
      3L -> s"${ws("c", 1, 8)} ${ws("x", 1, 5)} ${ws("d", 1, 9)}",
      4L -> s"e1 ${ws("c", 1, 8)} f1 f2 ${ws("d", 1, 9)} e2",
      5L -> s"${ws("r", 1, 10)} ${ws("s", 1, 4)} ${ws("r", 1, 10)}",
      6L -> ws("u", 1, 12),
      7L -> ws("v", 1, 5))
    val tmp = java.nio.file.Files.createTempDirectory("graft-substr-").toString
    import spark.implicits._
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("dedup_substring")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got(1L) === ((20L, 12L)))
    assert(got(2L) === ((16L, 12L)))
    assert(got(3L) === ((22L, 17L)))
    assert(got(4L) === ((21L, 17L)))
    assert(got(5L) === ((24L, 0L))) // within-doc repeat is NOT substring dup
    assert(got(6L) === ((12L, 0L)))
  }

  test("dedup_substring plan: hit semi-join broadcasts; merge window only over hits") {
    val plan = SparkEntry.queries("dedup_substring")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("leftsemi"),
      s"no semi-join against the duplicated-window set:\n$plan")
    // the windowed-token stream is shuffled ONCE for the global window
    // group; the per-doc interval merge adds one doc_id shuffle of only
    // the hit rows — nothing else may shuffle the stream
    val gramShuffles = "hashpartitioning\\(g#".r.findAllMatchIn(plan).size
    assert(gramShuffles <= 2, // groupBy(g) + semi-join key exchange
      s"window stream shuffled $gramShuffles times:\n$plan")
  }

  test("dedup_substring_hashed == string-keyed form; hashed key rides the shuffle") {
    val hashed = SparkEntry.queries("dedup_substring_hashed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val strings = SparkEntry.queries("dedup_substring")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(hashed === strings)
    // the window-keyed exchanges must carry the LONG hash, not the string
    val plan = SparkEntry.queries("dedup_substring_hashed")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(g#\\d+L".r.findFirstIn(plan).isDefined,
      s"shuffle key is not the 8-byte hash:\n$plan")
  }

  test("q_stream_neardedup: hot band bucket caps per probe — overflow batch dropped, earlier pairs kept") {
    // 101 IDENTICAL docs: every band bucket holds all of them, one over
    // BucketCap=100. The batch path drops the whole bucket (zero pairs);
    // the streaming path accumulates across 4 micro-batches, so probes
    // BEFORE the bucket overflows still pair up — and the batch that tips
    // the count past the cap is dropped, bounding its fan-out
    val tmp = java.nio.file.Files.createTempDirectory("graft-capstream-").toString
    import spark.implicits._
    val text = (1 to 20).map("x" + _).mkString(" ")
    (1L to 101L).map(i => (i, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, tmp).collect()
    assert(batch.isEmpty, "batch path must drop the over-cap bucket whole")
    val streamed = SparkEntry.queries("q_stream_neardedup")(spark, tmp).collect()
    assert(streamed.nonEmpty, "pairs discovered before overflow must be kept")
    assert(streamed.length < 101 * 100 / 2,
      "the capped probe must drop the overflowing micro-batch")
    assert(streamed.forall(_.getDouble(2) === 1.0)) // identical docs
  }

  test("q_stream_neardedup: per-batch checkpoints die with their batch — MemoryStore does not grow with stream length") {
    // each micro-batch localCheckpoints its band keys / shingle state /
    // candidate pairs; a checkpoint's RDD lives outside the CacheManager
    // and is otherwise freed only when GC + the async ContextCleaner get
    // around to it — allocation-pressure-dependent timing, the lag class
    // the clusterLabels OOM (§4) demonstrated. The per-batch sweep makes
    // release deterministic; this pins it. Suites run sequentially in
    // this JVM, so a persistent-RDD id that survives the stream was
    // leaked by the stream itself (pre-fix this fails with the last
    // batch's un-swept checkpoint still registered).
    val keysT = java.nio.file.Files.createTempDirectory("graft-sndl-k-").toString + "/t"
    val setsT = java.nio.file.Files.createTempDirectory("graft-sndl-s-").toString + "/t"
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val streamed = graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT).collect()
    assert(streamed.nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"per-batch checkpoints must be freed at batch end; leaked RDD ids: $leaked")
  }

  test("batch checkpoint sweep frees ONLY the batch's own checkpoints — a concurrent query's survives") {
    // r19's sweep diffed getPersistentRDDs around the batch window, so a
    // checkpoint persisted by a CONCURRENT query inside the window was
    // swept too. A localCheckpoint truncates lineage — its blocks are the
    // only copy — so that sweep makes the other query's later reads fail
    // unrecoverably (checkpoint block not found), not re-cache. The r20
    // tracker registers exactly the frames the batch body itself
    // checkpointed; this pins both sides of that contract.
    import spark.implicits._
    def rddIds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
      }.toSeq
    var foreign: org.apache.spark.sql.DataFrame = null
    var mineIds: Seq[Int] = Seq.empty
    graft.operators.CheckpointTracker.freeing {
      // simulates an ad-hoc query on the shared session checkpointing
      // DURING the batch window, outside the tracker
      foreign = Seq(1L, 2L, 3L).toDF("x").localCheckpoint()
      val mine = graft.operators.CheckpointTracker.ckpt(Seq(4L, 5L).toDF("y"))
      assert(mine.count() === 2L)
      mineIds = rddIds(mine)
    }
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(mineIds.nonEmpty && mineIds.forall(!persisted.contains(_)),
      "the batch's own checkpoint must be released at the boundary")
    val foreignIds = rddIds(foreign)
    assert(foreignIds.nonEmpty && foreignIds.forall(persisted.contains),
      "a concurrent query's checkpoint must survive the batch sweep")
    assert(foreign.count() === 3L) // and still be readable
    foreignIds.foreach(id => spark.sparkContext.getPersistentRDDs
      .get(id).foreach(_.unpersist(blocking = false)))
  }

  test("q_stream_neardedup: state tables are bucketed and probes scan only the batch's bucket cover") {
    import graft.sources.lance.ManifestIO
    val keysT = java.nio.file.Files.createTempDirectory("graft-sndd-k-").toString + "/t"
    val setsT = java.nio.file.Files.createTempDirectory("graft-sndd-s-").toString + "/t"
    val streamed = graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT).collect()
    assert(streamed.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    // every state fragment from every micro-batch epoch carries its
    // bucket tag — the invariant the read.buckets probe restriction
    // depends on (one untagged fragment would be re-read every batch)
    val mk = ManifestIO.loadLatest(keysT, conf).get
    val ms = ManifestIO.loadLatest(setsT, conf).get
    assert(mk.fragments.nonEmpty && mk.fragments.forall(_.bucket.isDefined),
      mk.fragments.map(f => f.path -> f.bucket))
    assert(ms.fragments.nonEmpty && ms.fragments.forall(_.bucket.isDefined),
      ms.fragments.map(f => f.path -> f.bucket))
    // a probe restricted to a strict subset of buckets enumerates ONLY
    // that cover's fragments — per-batch state IO ∝ the cover, not history
    val someBuckets = mk.fragments.flatMap(_.bucket).distinct.sorted.take(2)
    val restricted = spark.read.format("lance")
      .option("read.buckets", someBuckets.mkString(",")).load(keysT)
    val plan = restricted.queryExecution.executedPlan.toString
    val cover = mk.fragments.count(_.bucket.exists(someBuckets.toSet))
    assert(cover < mk.fragments.size, "need a strict subset to prove pruning")
    assert(plan.contains(s"fragments=$cover/${mk.fragments.size}"), plan)
  }

  test("dedup_ngram_jaccard: LSH candidates + exact verify == brute-force block join (sf0.001)") {
    val lsh = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the pre-LSH form: direct (lang, ±40 chars) block join, all pairs
    def g = Tables.t(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.functions.ngram_hashes(col("text"), 3).as("s"))
    val brute = g.select(col("doc_id").as("a_id"), col("lang"),
        col("n_chars").as("na"), col("s").as("sa"))
      .join(g.select(col("doc_id").as("b_id"), col("lang"),
        col("n_chars").as("nb"), col("s").as("sb")), "lang")
      .filter(col("a_id") < col("b_id") && abs(col("na") - col("nb")) <= 40)
      .withColumn("jaccard", graft.functions.sorted_jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= 0.75)
      .select("a_id", "b_id", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === brute)
    assert(lsh.nonEmpty)
  }

  test("dedup_ngram_jaccard: over-cap blocks escalate to LSH; mass-dup band buckets drop (bounded fan-out)") {
    // 600 IDENTICAL docs (same lang/length): the (lang, bucket) block
    // overflows BlockCap=512, so tier 1 refuses the 600²/2 quadratic
    // budget and escalates the members to the LSH tier — where every band
    // bucket holds all 600, over BucketCap=100, and the capped collect
    // NULLs them whole. Net: a mass-duplicate cluster produces NO near-dup
    // pairs (bounded fan-out; exact dedup owns that regime upstream).
    // 80 identical docs stay under BlockCap and pair up exactly in tier 1.
    val tmp = java.nio.file.Files.createTempDirectory("graft-ngramcap-").toString
    import spark.implicits._
    def mk(n: Int) = (1L to n.toLong)
      .map(i => (i, "the quick brown fox jumps over the lazy dog repeatedly", "en", 54L))
      .toDF("doc_id", "text", "lang", "n_chars")
    mk(600).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(SparkEntry.queries("dedup_ngram_jaccard")(spark, tmp).collect().isEmpty,
      "over-cap block must escalate to LSH, whose mass-dup band buckets drop whole")
    mk(80).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(SparkEntry.queries("dedup_ngram_jaccard")(spark, tmp).count() === 80L * 79 / 2)
  }

  test("capped_block_list: gram budget bounds aggregation state in bytes, not members") {
    // 3 members x 100 gram slots with budget 250: the member cap (512)
    // never trips, the BYTE bound does — the block escalates (NULL) just
    // like an over-cap one, so one group of huge documents can never pin
    // ~cap x largest-doc gram payload in executor memory or on the wire
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 3L).map(i => (i, "g1")).toDF("doc_id", "grp")
      .withColumn("flag", lit(0))
      .withColumn("n_chars", lit(10L))
      .withColumn("s", sequence(lit(1L), lit(100L)))
    def agg(budget: Long) = df.repartition(3).groupBy("grp")
      .agg(graft.functions.capped_block_list(
        col("doc_id"), col("flag"), col("n_chars"), col("s"), 512,
        gramBudget = budget).as("m"))
      .select("m").collect()(0)
    assert(agg(250L).isNullAt(0), "300 gram slots > 250 budget must escalate")
    val ok = agg(1000L)
    assert(!ok.isNullAt(0) && ok.getSeq(0).length === 3)
  }

  test("dedup_embedding: chunked triangle join == plain all-pairs; hot block fans out bounded") {
    import spark.implicits._
    // engineered hot block: 300 vectors in ONE label (≈ 5 chunks at
    // cap=64) plus a small second label that stays unchunked
    val rnd = new scala.util.Random(7)
    val e = ((1L to 300L).map(i => (i, Array.fill(8)(rnd.nextFloat()), 1)) ++
        (1000L to 1020L).map(i => (i, Array.fill(8)(rnd.nextFloat()), 2)))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int").as("label"))
      .localCheckpoint()
    val chunkedPairs = graft.operators.Dedup
      .embeddingPairs(e, cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val brute = e.select(col("vec_id").as("a_id"), col("label"), col("embedding").as("va"))
      .join(e.select(col("vec_id").as("b_id"), col("label"), col("embedding").as("vb")), "label")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(graft.functions.vec_cosine(col("va"), col("vb")), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(chunkedPairs === brute) // 300*299/2 + 21*20/2 pairs, each exactly once
    // the hot label really split into multiple chunk-pair keys, and no
    // single key's candidate fan-out exceeds ~cap² (the per-task bound —
    // hash chunking makes chunk sizes ~cap in expectation, 4× is slack)
    val counts = e.groupBy("label").agg(count(lit(1)).as("n_lbl"))
    val chunked = e.join(counts, "label")
      .withColumn("nc", ceil(col("n_lbl").cast("double") / 64).cast("int"))
      .withColumn("c", pmod(xxhash64(col("vec_id")), col("nc")).cast("int"))
    val perKey = chunked.select(col("label"), col("c").as("ci"),
        explode(expr("sequence(c, nc - 1)")).as("cj"))
      .join(chunked.select(col("label"), col("c").as("cj"),
        explode(expr("sequence(0, c)")).as("ci")), Seq("label", "ci", "cj"))
      .groupBy("label", "ci", "cj").count().collect()
    assert(perKey.count(_.getInt(0) == 1) > 1, "hot label must split into several keys")
    assert(perKey.map(_.getLong(3)).max <= 64L * 64 * 4,
      s"per-key fan-out unbounded: ${perKey.map(_.getLong(3)).max}")
  }

  test("q_stream_dedup: per-batch sink rows ∝ the batch, not accumulated history") {
    // sf0.001's 500 documents are all distinct texts: split over 8
    // micro-batches, update mode must append only each batch's ~62 new
    // hash groups. The complete-mode + full-overwrite shape this replaces
    // would write the cumulative state every batch (62, 125, ... 500 —
    // 2250 rows total, with the LAST batch alone rewriting all 500)
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-sdedup-st-").toString + "/t"
    val appended = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val result = graft.operators.StreamingOps
      .streamDedupAt(spark, docs, state, srcParts = 8,
        onBatch = (bid, n) => appended.synchronized { appended += ((bid, n)) })
      .collect()
    val perBatch = appended.synchronized(appended.sortBy(_._1).map(_._2).toList)
    assert(perBatch.sum === 500L, s"total delta rows must equal distinct hashes: $perBatch")
    assert(perBatch.count(_ > 0) >= 4, s"need several real micro-batches: $perBatch")
    assert(perBatch.forall(_ < 150L),
      s"a batch appended history-sized output (complete-mode regression): $perBatch")
    // and the merged read still equals the batch dedup_exact answer
    val batch = SparkEntry.queries("dedup_exact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(result.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      === batch.toSeq)
  }

  test("q_stream_dedup: re-touched hash groups resolve to their latest generation") {
    // 60 docs over 12 distinct texts, spread across 4 micro-batches: most
    // hash groups are touched by SEVERAL batches, so the state table holds
    // multiple generations per hash and the merge-on-read (latest gen
    // wins) is what produces the correct totals
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"text number ${i % 12} body")).toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-sdedup-mg-").toString + "/t"
    val appended = scala.collection.mutable.ArrayBuffer.empty[Long]
    val result = graft.operators.StreamingOps
      .streamDedupAt(spark, docs, state, srcParts = 4,
        onBatch = (_, n) => appended.synchronized { appended += n })
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(result.toSeq === expected.toSeq)
    // re-emission across batches is what this test exercises: more delta
    // rows than final groups proves stale generations existed and lost
    assert(appended.synchronized(appended.sum) > 12L,
      s"expected re-touched groups across batches: ${appended.toList}")
    // raw state (no merge) holds every generation — strictly more rows
    assert(spark.read.format("lance").load(state).count() > 12L)
  }

  test("q_stream_dedup: crash between state append and checkpoint commit — replay is a no-op") {
    // The at-least-once hole in a generation-tagged state table: the batch
    // APPENDS its delta, then crashes BEFORE the checkpoint commit. On
    // restart the same batch replays with the same bid. Without a guard it
    // would re-append the generation (duplicate rows per (h, gen)); the
    // bid-vs-max(gen) high-water guard makes the replay a no-op instead.
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"crash text ${i % 12} body")).toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("graft-sdedup-cr-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sdedup-cr-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdedup-cr-ck-").toString
    def run() = graft.operators.StreamingOps
      .streamDedupAt(spark, docs, state, srcParts = 4, srcDir0 = srcDir, ckpt0 = ckpt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val first = run()
    val stateRows = spark.read.format("lance").load(state).count()
    assert(stateRows > 0)
    // simulate the crash point: the state append is durable, the
    // checkpoint's last commit marker is not
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    val replayed = run()
    assert(spark.read.format("lance").load(state).count() === stateRows,
      "replayed batch re-appended its generation — the bid guard is broken")
    assert(replayed === first, "merge-on-read answer moved under replay")
    // and the answer is the batch dedup answer
    val expected = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(0))).toSeq
    assert(replayed === expected)
  }

  test("q_stream_neardedup: incremental LSH over micro-batches == batch LSH pairs") {
    val streamed = SparkEntry.queries("q_stream_neardedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the arriving corpus is split over 4 micro-batches, so cross-batch
    // pairs can only come from the accumulated band-key index — equality
    // with the single-shot batch result proves the incremental path
    assert(streamed.toSet === batch.toSet)
    assert(streamed.nonEmpty)
  }

  test("q_stream_neardedup: crash before the checkpoint commit — per-table replay no-ops") {
    // the near-dedup batch appends to THREE tables (verified pairs, band
    // keys, shingle sets); a crash between the appends and the checkpoint
    // commit replays the batch, and each table's bid high-water guard must
    // skip what it already holds — otherwise state doubles per replay and
    // later batches double-probe it
    val keysT = java.nio.file.Files.createTempDirectory("graft-sndd-cr-k-").toString + "/t"
    val setsT = java.nio.file.Files.createTempDirectory("graft-sndd-cr-s-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sndd-cr-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sndd-cr-ck-").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-sndd-cr-d-").toString + "/t"
    def run() = graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val first = run()
    assert(first.nonEmpty)
    def stateRows = (spark.read.format("lance").load(keysT).count(),
      spark.read.format("lance").load(setsT).count(),
      spark.read.format("lance").load(dst).count())
    val before = stateRows
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    val replayed = run()
    assert(stateRows === before,
      s"replay re-appended state: $before -> $stateRows")
    assert(replayed === first, "answer moved under replay")
  }

  test("q_stream_neardedup: state tables compact mid-stream — probes, replay guards, and answers survive") {
    // a long-running ingestion stream appends one state generation per
    // micro-batch; at 100 TB that fragments the state tables without
    // bound. The GENERIC maintenance compaction must be able to fold them
    // mid-stream: fragments merge WITHIN buckets (the restricted-probe
    // layout survives), the bid high-water answered from fragment stats
    // survives the rewrite (replay guards stay armed), and a stream
    // resumed AFTER the compaction probes the folded state to the same
    // answer as the never-compacted single-shot batch run
    import graft.sources.lance.{LanceMaintenance, ManifestIO}
    val keysT = java.nio.file.Files.createTempDirectory("graft-sndd-cp-k-").toString + "/t"
    val setsT = java.nio.file.Files.createTempDirectory("graft-sndd-cp-s-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sndd-cp-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sndd-cp-ck-").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-sndd-cp-d-").toString + "/t"
    def run() = graft.operators.StreamingOps
      .streamNearDedupAt(spark, sf, keysT, setsT,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = dst)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val d = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
    // half the corpus arrives first (2 micro-batches -> 2 state generations)
    d.filter(col("doc_id") % 2 === 0).repartition(2)
      .write.mode("overwrite").parquet(srcDir)
    run()
    val conf = spark.sessionState.newHadoopConf()
    val bidBefore = (operators.StreamingOps.lastBidOf(spark, keysT),
      operators.StreamingOps.lastBidOf(spark, setsT))
    val fragsBefore = (ManifestIO.loadLatest(keysT, conf).get.fragments.size,
      ManifestIO.loadLatest(setsT, conf).get.fragments.size)
    LanceMaintenance.compact(spark, keysT, 1000000000L, 10000000L)
    LanceMaintenance.compact(spark, setsT, 1000000000L, 10000000L)
    val (mk, ms) = (ManifestIO.loadLatest(keysT, conf).get,
      ManifestIO.loadLatest(setsT, conf).get)
    assert(mk.fragments.size < fragsBefore._1 && ms.fragments.size < fragsBefore._2,
      s"compaction folded nothing: $fragsBefore -> (${mk.fragments.size}, ${ms.fragments.size})")
    // the folded fragments keep their bucket tags — read.buckets probes
    // stay restricted — and the bid high-water answered from stats holds
    assert(mk.fragments.forall(_.bucket.isDefined), mk.fragments.map(_.bucket))
    assert(ms.fragments.forall(_.bucket.isDefined), ms.fragments.map(_.bucket))
    assert((operators.StreamingOps.lastBidOf(spark, keysT),
      operators.StreamingOps.lastBidOf(spark, setsT)) === bidBefore,
      "compaction moved the replay-guard high-water mark")
    // the other half arrives AFTER the fold; cross-half pairs can only
    // come from probing the compacted state
    d.filter(col("doc_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(srcDir)
    val all = run()
    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(all.toSet === batch.toSet)
    assert(all.nonEmpty)
  }

  test("q_stream_neardedup: compactEvery auto-folds state in-stream — same answer, fewer fragments, layout intact") {
    // the cadence knob the r17 object-store op audit motivates: per-batch
    // probe FS round trips grow with accumulated state FRAGMENTS, so the
    // shared micro-batch body can fold them itself every N batches
    // instead of relying on an out-of-band maintenance job
    import graft.sources.lance.ManifestIO
    val conf = spark.sessionState.newHadoopConf()
    def dataFiles(t: String): Int = {
      val fs = ManifestIO.fs(t, conf)
      val p = new org.apache.hadoop.fs.Path(t, ManifestIO.DataDir)
      if (fs.exists(p)) fs.listStatus(p).length else 0
    }
    def freshRun(compactEvery: Int, vacuum: Boolean = false)
        : (Seq[(Long, Long, Double)], Int, Int, Int, Int) = {
      val keysT = java.nio.file.Files.createTempDirectory("graft-sndd-ae-k-").toString + "/t"
      val setsT = java.nio.file.Files.createTempDirectory("graft-sndd-ae-s-").toString + "/t"
      val rows = graft.operators.StreamingOps
        .streamNearDedupAt(spark, sf, keysT, setsT, srcParts = 6,
          compactEvery = compactEvery, vacuumOnCompact = vacuum)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val mk = ManifestIO.loadLatest(keysT, conf).get
      val ms = ManifestIO.loadLatest(setsT, conf).get
      // the folded layout keeps its bucket tags — the read.buckets probe
      // restriction every later batch depends on
      assert(mk.fragments.forall(_.bucket.isDefined), mk.fragments.map(_.bucket))
      assert(ms.fragments.forall(_.bucket.isDefined), ms.fragments.map(_.bucket))
      (rows, mk.fragments.size, ms.fragments.size,
        dataFiles(keysT), dataFiles(setsT))
    }
    val (plain, pk, ps, pfk, pfs) = freshRun(compactEvery = 0)
    val (folded, fk, fs, _, _) = freshRun(compactEvery = 2)
    assert(folded === plain, "auto-compaction changed the answer")
    assert(fk < pk && fs < ps,
      s"auto-compaction folded nothing: keys $pk->$fk, sets $ps->$fs")
    // the vacuum arm: superseded fragments + old manifests dropped
    // in-stream, so the PHYSICAL footprint stays ∝ live state — and the
    // answer still byte-identical
    val (vac, vk, vs, vfk, vfs) = freshRun(compactEvery = 2, vacuum = true)
    assert(vac === plain, "vacuumOnCompact changed the answer")
    assert(vk < pk && vs < ps)
    assert(vfk < pfk && vfs < pfs,
      s"vacuum left superseded data files: keys $pfk->$vfk, sets $pfs->$vfs")
  }

  test("q_stream_embedding_dedup: streamed incremental cosine pairs == batch dedup_embedding row-for-row") {
    // the embedding member of the streaming near-dup family: same
    // nearDedupBatch skeleton, label-bucket probes, exact cosine verify —
    // streamed == batch is the whole correctness statement (and both are
    // gated on the same SQL oracle)
    val streamed = SparkEntry.queries("q_stream_embedding_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.getDouble(3))).toSeq
    val batch = SparkEntry.queries("dedup_embedding")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.getDouble(3))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_semantic: the incrementally-maintained survivor view == batch dedup_semantic row-for-row") {
    // components only merge as pairs stream in, so the end-of-stream
    // closure is order-independent — the per-batch REPLACE WHERE upserts
    // (touched components only, retractions included) must land on
    // exactly the batch answer
    val streamed = SparkEntry.queries("q_stream_semantic")(spark, sf)
      .collect().map(r => (r.getLong(0), r.get(1))).toSeq
    val batch = SparkEntry.queries("dedup_semantic")(spark, sf)
      .collect().map(r => (r.getLong(0), r.get(1))).toSeq
    assert(streamed === batch)
  }

  test("closeLabels: the driver union-find and the distributed propagation produce identical labels") {
    // the MV's per-batch closure picks its path by edge count; both must
    // be the same function (node → component MIN) — run one chain-heavy
    // graph through both (cap above and below the edge count)
    import spark.implicits._
    val edges = Seq(
      (9L, 4L), (4L, 12L), (12L, 2L), // chain collapsing to 2
      (20L, 21L),                     // separate pair
      (30L, 31L), (31L, 7L), (7L, 30L) // cycle with min 7
    ).toDF("a_id", "b_id")
    def labelsWith(cap: Long): Map[Long, Long] =
      graft.operators.StreamingOps.closeLabels(spark, edges, cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = labelsWith(cap = 1000L)
    val dist = labelsWith(cap = 0L)
    assert(local === dist, "closure paths diverged")
    assert(local(9L) === 2L && local(21L) === 20L && local(31L) === 7L)
  }

  test("q_stream_semantic: a later bridge vector RETRACTS the losing representative") {
    // the behavior an append-only sink cannot express, and the reason the
    // view updates by atomic REPLACE WHERE: ids 1 and 5 are orthogonal
    // (both survive), id 7 joins 1's component, then id 9 arrives close
    // to BOTH 1 and 5 (cos ≈ 0.707 each) — the two standing components
    // merge and 5, a survivor until that batch, must disappear
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("ssem-ret-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssem-ret-ck-").toString
    val keysT = java.nio.file.Files.createTempDirectory("ssem-ret-k-").toString + "/t"
    val vecsT = java.nio.file.Files.createTempDirectory("ssem-ret-v-").toString + "/t"
    val survT = java.nio.file.Files.createTempDirectory("ssem-ret-s-").toString + "/t"
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](64); parts.foreach { case (i, x) => a(i) = x }; a
    }
    def write(rows: Seq[(Long, Int, Array[Float])]): Unit =
      rows.toDF("vec_id", "label", "embedding")
        .coalesce(1).write.mode("append").parquet(srcDir)
    write(Seq((1L, 0, vec(0 -> 1f)), (5L, 0, vec(1 -> 1f))))
    write(Seq((7L, 0, vec(0 -> 1f, 2 -> 1.2f)))) // cos(7,1)=0.64, cos(7,5)=0
    def run(): Seq[Long] = graft.operators.StreamingOps
      .streamSemanticAt(spark, sf, keysT, vecsT,
        srcDir0 = srcDir, ckpt0 = ckpt, dst0 = survT)
      .collect().map(_.getLong(0)).toSeq
    assert(run() === Seq(1L, 5L), "pre-bridge survivors wrong")
    write(Seq((9L, 0, vec(0 -> 1f, 1 -> 1f)))) // bridges 1 and 5
    assert(run() === Seq(1L), "bridge did not retract the losing representative")
  }

  test("dedup_semantic: survivors == corpus minus non-min members of the cosine components") {
    // independent local union-find over the SAME pair set the operator
    // consumes (dedup_embedding's gated answer) — the distributed
    // min-label propagation + anti-join must reproduce it exactly
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // larger root under smaller: every component's final root is its
      // min id — the operator's representative rule
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val dropped = nodes.filter(n => find(n) != n).toSet
    assert(dropped.nonEmpty, "fixture never exercises the drop path")
    val all = Tables.t(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = (all -- dropped).toSeq.sorted
    val got = SparkEntry.queries("dedup_semantic")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected)
  }

  test("dedup_semantic_trained == fixture-label SemDeDup on a planted corpus no cell partition can split") {
    import spark.implicits._
    // 6 semantic groups of IDENTICAL unit vectors on mutually orthogonal
    // axes + 8 orthogonal singletons. Identical vectors have identical
    // argmin inputs, so ANY centroid set assigns a group to one cell —
    // no trained partition can split a pair; and orthogonal groups have
    // cos 0 < tau, so no cell can INVENT a cross-group pair. Hence
    // trained survivors == fixture-label survivors == group minima +
    // singletons, for whatever KMeans converges to — the equality tests
    // the COMPOSITION (stored-centroid reload, NearestCell assignment,
    // pair/closure/anti-join tail), not the training's luck.
    def axis(i: Int, scale: Float): Array[Float] = {
      val a = new Array[Float](64); a(i) = scale; a
    }
    val grouped = (0 until 6).flatMap { g =>
      (0 until 5).map(j => (g * 100L + j, g, axis(g, 1f + g * 0.25f)))
    }
    val singles = (0 until 8).map(i => (1000L + i, 10 + i, axis(20 + i, 2f)))
    val e = (grouped ++ singles).toDF("vec_id", "label", "embedding")
      .localCheckpoint()
    // fixture-label path: the dedup_semantic tail over the given labels
    val fixture = operators.Dedup.semanticSurvivors(spark,
      e.select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding")))
      .collect().map(_.getLong(0)).toSeq
    // trained path: persisted IVF build → sidecar reload → NearestCell
    val root = java.nio.file.Files
      .createTempDirectory("graft-semtr-").toString + "/t"
    val idx = operators.IndexBuild.build(spark, e, root,
      Map("index.type" -> "IVF_FLAT", "index.num-partitions" -> "8"))
    val cents = operators.IndexBuild.load(spark, idx.root).centroids.map(_.toArray)
    val trained = operators.Dedup.semanticSurvivors(spark,
      operators.Dedup.trainedAssign(e, cents))
      .collect().map(_.getLong(0)).toSeq
    val expected = ((0 until 6).map(_ * 100L) ++ (0 until 8).map(1000L + _)).sorted
    assert(trained === expected, s"trained survivors wrong: $trained")
    assert(fixture === expected, s"fixture survivors wrong: $fixture")
  }

  test("dedup_semantic_trained: the key runs on the sf corpus and arms its centroid-literal oracle") {
    val got = SparkEntry.queries("dedup_semantic_trained")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    val all = Tables.t(spark, sf, "embeddings").count()
    assert(got.length <= all, "more survivors than vectors")
    assert(got.map(_._1).distinct.length === got.length, "duplicate survivor ids")
    // the run must have armed the lazily-built DuckDB oracle with 16
    // centroid literals (the driver's full rows+schema+hash gate path)
    val sql = operators.Dedup.oracleSql.get("dedup_semantic_trained")
    assert(sql.isDefined, "trained oracle not armed after the key ran")
    assert(sql.get.contains("VALUES (0, [") && sql.get.contains("(15, ["),
      "oracle does not carry the 16 trained centroid literals")
  }

  test("dedup_semantic_sweep: pairs shrink and survivors grow monotonically in tau; the tau=0.4 point IS dedup_semantic") {
    val rows = SparkEntry.queries("dedup_semantic_sweep")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === operators.Dedup.SweepTaus)
    rows.sliding(2).foreach { case Array((t0, p0, d0, s0), (t1, p1, d1, s1)) =>
      assert(p1 <= p0, s"pairs grew from tau=$t0 to $t1")
      assert(d1 <= d0, s"dropped grew from tau=$t0 to $t1")
      assert(s1 >= s0, s"survivors shrank from tau=$t0 to $t1")
    }
    assert(rows.head._2 > rows.last._2, "sweep is flat — fixture exercises nothing")
    // the curve's tau=0.4 point must agree with the full operator
    val semantic = SparkEntry.queries("dedup_semantic")(spark, sf).count()
    assert(rows.find(_._1 == 0.4).get._4 === semantic)
  }

  test("CALL system.semdedup: planted groups collapse to min-id survivors, whole rows materialize, summary counts") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_sd",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sd.warehouse",
      java.nio.file.Files.createTempDirectory("graft-sd-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sd.db")
    // 3 groups of identical unit vectors (no cell partition can split
    // them) + 4 orthogonal singletons; an extra payload column proves the
    // survivors carry EVERY corpus column, not just (id, vector)
    def axis(i: Int): Array[Float] = { val a = new Array[Float](16); a(i) = 1f; a }
    val rows = (0 until 3).flatMap(g =>
      (0 until 4).map(j => (g * 10L + j, axis(g), s"doc-$g-$j"))) ++
      (0 until 4).map(i => (100L + i, axis(8 + i), s"single-$i"))
    rows.toDF("vec_id", "embedding", "payload")
      .createOrReplaceTempView("sd_src")
    spark.sql("CREATE TABLE graft_sd.db.c AS SELECT * FROM sd_src")
    val summary = spark.sql(
      "CALL graft_sd.system.semdedup(table => 'db.c', cells => 4, " +
        "output_table => 'db.curated')").collect()
    assert(summary.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((9L, 7L)),
      s"summary wrong: ${summary.toSeq}") // 3 groups drop 3 each; 3+4 survive
    val out = spark.table("graft_sd.db.curated")
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(0L, 10L, 20L, 100L, 101L, 102L, 103L))
    assert(out.forall { case (id, p) => p.nonEmpty }, "payload column lost")
    // a missing output_table fails fast
    val e = intercept[Exception](spark.sql(
      "CALL graft_sd.system.semdedup(table => 'db.c')").collect())
    assert(e.getMessage.contains("output_table"))
  }

  test("q_stream_semantic_trained: the incrementally-maintained trained-cell view == batch dedup_semantic_trained row-for-row") {
    // same closure argument as the fixture twin (components only merge),
    // same frozen centroids on both sides (trainedSemIndex memoizes per
    // session+dir), so end-of-stream == batch is the whole statement
    val streamed = SparkEntry.queries("q_stream_semantic_trained")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = SparkEntry.queries("dedup_semantic_trained")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("dedup_canonical: best-quality member survives each cluster; singletons keep themselves") {
    val canonical = SparkEntry.queries("dedup_canonical")(spark, sf).collect()
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // keep_id -> n_docs
    val nDocs = Tables.t(spark, sf, "documents").count()
    // one survivor per cluster + one per unclustered doc
    val clusteredNodes = clusters.values.sum
    assert(canonical.length === nDocs - clusteredNodes + clusters.size)
    val byCluster = canonical.map(r => r.getLong(0) -> r).toMap
    // every multi-doc cluster appears with its size, and the canonical is
    // NOT always min-id (quality actually decides) — checked via labels
    clusters.foreach { case (keepId, n) =>
      val row = byCluster(keepId)
      assert(row.getLong(2) === n, s"cluster $keepId size")
    }
    // the canonical of each cluster has the max quality among members
    val (labels, _) = operators.Dedup.clusterLabels(spark,
      SparkEntry.queries("dedup_minhash_lsh")(spark, sf).select("a_id", "b_id"))
    val quality = SparkEntry.queries("text_quality")(spark, sf)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap // (doc_id, quality)
    val members = labels.collect().groupBy(_.getLong(1))
    members.foreach { case (lbl, rows) =>
      val best = rows.map(r => (quality(r.getLong(0)), -r.getLong(0))).max
      val chosen = byCluster(lbl).getLong(1)
      assert((quality(chosen), -chosen) === best,
        s"cluster $lbl canonical $chosen is not the best-quality member")
    }
  }

  test("dedup_semantic plan: AQE turns the drop-list anti-join into a broadcast at runtime") {
    // no broadcast HINT by design (a heavily-duplicated corpus must be
    // allowed to degrade to the shuffled anti-join) — so the broadcast
    // must come from AQE's runtime size of the materialized drop list:
    // assert on the FINAL adaptive plan, after execution
    val df = SparkEntry.queries("dedup_semantic")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.toLowerCase.contains("leftanti"),
      s"drop list not applied as a broadcast anti-join:\n$plan")
  }

  test("dedup_canonical plan: unclustered docs take the broadcast anti-join fast path") {
    val plan = SparkEntry.queries("dedup_canonical")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast join in the canonical plan:\n$plan")
    assert(plan.toLowerCase.contains("leftanti"),
      s"no anti-join fast path in the canonical plan:\n$plan")
  }

  test("hashed gram/shingle sets match their SQL-chain equivalents") {
    val docs = Tables.t(spark, sf, "documents").limit(50)
    val gramChain = expr("array_sort(transform(array_distinct(transform(" +
      "sequence(1, length(text) - 2), i -> substring(text, i, 3))), g -> xxhash64(g)))")
    val nDiffG = docs
      .select(graft.functions.ngram_hashes(col("text"), 3).as("fast"), gramChain.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(nDiffG === 0)
    val shingleChain = expr("array_sort(array_distinct(transform(" +
      "sequence(1, size(w) - 2), i -> xxhash64(" +
      "concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))))")
    val nDiffS = docs.withColumn("w", toks)
      .filter(size(col("w")) >= 3)
      .select(graft.functions.shingle_hashes(col("text"), 3).as("fast"), shingleChain.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(nDiffS === 0)
  }

  test("simhash banded pairs == brute-force hamming pairs (sf0.001)") {
    val sigs = Tables.t(spark, sf, "documents")
      .withColumn("w", toks)
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), simhash(col("w"), 42L).as("sig"))
    val a = sigs.select(col("doc_id").as("a_id"), col("sig").as("siga"))
    val b = sigs.select(col("doc_id").as("b_id"), col("sig").as("sigb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("h", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("h") <= 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SparkEntry.queries("dedup_simhash")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
  }

  test("dedup_simhash: an adversarial mega-bucket is dropped whole (bounded fan-out)") {
    // 150 identical docs share one signature — all 4 band buckets overflow
    // BucketCap=100 and NULL out, so the adversarial corpus produces zero
    // pairs instead of n²/2; at 80 docs the buckets stay under the cap and
    // every pair (hamming 0) comes through
    val tmp = java.nio.file.Files.createTempDirectory("graft-simhashcap-").toString
    import spark.implicits._
    def mk(n: Int) = (1L to n.toLong)
      .map(i => (i, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    mk(150).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(SparkEntry.queries("dedup_simhash")(spark, tmp).collect().isEmpty)
    mk(80).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = SparkEntry.queries("dedup_simhash")(spark, tmp).collect()
    assert(pairs.length === 80 * 79 / 2)
    assert(pairs.forall(_.getLong(2) === 0L))
  }

  test("CALL system.dedup: exact survivors materialize whole-row, pairs/clusters == the gated machinery, errors fail fast") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_dd",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dd.warehouse",
      java.nio.file.Files.createTempDirectory("graft-dd-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dd.db")
    // two exact-dup groups (ids 1,2,3 and 10,11), one near-dup pair that
    // is NOT exact (20 ~ 21: one word differs over a long shared tail),
    // and a singleton; a payload column proves survivors keep every column
    val near0 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near1 = near0.replace("tok30", "tok31")
    val rows = Seq(
      (1L, "alpha beta gamma", "p1"), (2L, "alpha beta gamma", "p2"),
      (3L, "alpha beta gamma", "p3"), (10L, "delta epsilon phi", "p10"),
      (11L, "delta epsilon phi", "p11"), (20L, near0, "p20"),
      (21L, near1, "p21"), (30L, "zeta eta theta iota", "p30"))
    rows.toDF("doc_id", "text", "payload").createOrReplaceTempView("dd_src")
    spark.sql("CREATE TABLE graft_dd.db.c AS SELECT * FROM dd_src")
    // exact: min-id survivors, every column, summary arithmetic
    val summary = spark.sql("CALL graft_dd.system.dedup(table => 'db.c', " +
      "method => 'exact', output_table => 'db.u')").collect()
    assert(summary.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((8L, 3L, 5L)), s"summary wrong: ${summary.toSeq}")
    val out = spark.table("graft_dd.db.u").collect()
      .map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 10L, 20L, 21L, 30L))
    assert(out.forall(_._2.nonEmpty), "payload column lost")
    // pairs: the CALL's rows == Dedup.minhashPairsFor over the same docs
    val called = spark.sql(
      "CALL graft_dd.system.dedup(table => 'db.c', method => 'pairs')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    val direct = operators.Dedup.minhashPairsFor(
        rows.toDF("doc_id", "text", "payload").select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(called.toSeq === direct.toSeq)
    assert(called.map(p => (p._1, p._2)).toSet
      === Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (20L, 21L)))
    // clusters: {1,2,3} one component, {10,11}, {20,21}; sum_ids checks
    val comps = spark.sql(
      "CALL graft_dd.system.dedup(table => 'db.c', method => 'clusters')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(comps.toSeq === Seq((1L, 3L, 6L), (10L, 2L, 21L), (20L, 2L, 41L)))
    // pairs with output_table: materialized rows == the direct answer
    spark.sql("CALL graft_dd.system.dedup(table => 'db.c', " +
      "method => 'pairs', output_table => 'db.p')")
    val mat = spark.table("graft_dd.db.p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(mat === direct.map(p => (p._1, p._2)).toSeq)
    // exact without output_table and an unknown method fail fast
    val e1 = intercept[Exception](spark.sql(
      "CALL graft_dd.system.dedup(table => 'db.c', method => 'exact')").collect())
    assert(e1.getMessage.contains("output_table"))
    val e2 = intercept[Exception](spark.sql(
      "CALL graft_dd.system.dedup(table => 'db.c', method => 'fuzzy')").collect())
    assert(e2.getMessage.contains("unknown method"))
    // canonical: best-quality survivor per cluster through the CALL ==
    // the factored machinery's contract on the same fixture (clusters
    // {1,2,3}/{10,11}/{20,21} each yield ONE canonical; singletons are
    // their own) — 4 rows total, n_docs summing to the corpus
    val canon = spark.sql(
      "CALL graft_dd.system.dedup(table => 'db.c', method => 'canonical')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(canon.length === 4)
    assert(canon.map(_._3).sum === 8L)
    assert(canon.map(_._1).toSet === Set(1L, 10L, 20L, 30L))
  }

  test("r20 procedures survive degenerate corpora: empty table, single doc, all-identical mega-bucket") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_dg",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dg.warehouse",
      java.nio.file.Files.createTempDirectory("graft-dg-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dg.db")
    Seq((1L, "alpha beta gamma", "src0")).toDF("doc_id", "text", "source")
      .filter(col("doc_id") < 0).createOrReplaceTempView("dg_empty")
    Seq((1L, "alpha beta gamma", "src0")).toDF("doc_id", "text", "source")
      .createOrReplaceTempView("dg_one")
    (1L to 150L).map(i => (i, "alpha beta gamma delta epsilon", "src0"))
      .toDF("doc_id", "text", "source").createOrReplaceTempView("dg_same")
    for (t <- Seq("empty", "one", "same"))
      spark.sql(s"CREATE TABLE graft_dg.db.$t AS SELECT * FROM dg_$t")
    def call(sql: String) = spark.sql(sql).collect()
    // dedup: every mode completes; empty in = empty/zero out; the
    // 150-identical corpus overflows every band bucket (BucketCap=100) so
    // 'pairs' drops the mega-bucket whole (recall-safe posture) while
    // 'exact' still collapses it to one survivor
    for (t <- Seq("empty", "one")) {
      val s0 = call(s"CALL graft_dg.system.dedup(table => 'db.$t', " +
        s"method => 'exact', output_table => 'db.${t}_u')")
      val n = if (t == "empty") 0L else 1L
      assert(s0.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
        === Seq((n, 0L, n)), s"$t exact summary")
      assert(call(s"CALL graft_dg.system.dedup(table => 'db.$t', method => 'pairs')").isEmpty)
      assert(call(s"CALL graft_dg.system.dedup(table => 'db.$t', method => 'clusters')").isEmpty)
      assert(call(s"CALL graft_dg.system.dedup(table => 'db.$t', method => 'canonical')").length
        === n.toInt)
    }
    assert(call("CALL graft_dg.system.dedup(table => 'db.same', method => 'pairs')").isEmpty,
      "mega-bucket was not dropped whole")
    val sSame = call("CALL graft_dg.system.dedup(table => 'db.same', " +
      "method => 'exact', output_table => 'db.same_u')")
    assert(sSame.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((150L, 149L, 1L)))
    // sample: every mode returns empty on the empty corpus and completes
    // on the single-doc one
    for (t <- Seq("empty", "one")) {
      val mix = call(s"CALL graft_dg.system.sample(table => 'db.$t', " +
        "method => 'mixture', shares => 'src0:100')")
      val tmp = call(s"CALL graft_dg.system.sample(table => 'db.$t', " +
        "method => 'temperature', budget => 100)")
      val bud = call(s"CALL graft_dg.system.sample(table => 'db.$t', " +
        "method => 'token_budget', budget => 100)")
      val n = if (t == "empty") 0 else 1
      assert(mix.length === n && tmp.length === n && bud.length === n,
        s"$t sample: ${mix.length}/${tmp.length}/${bud.length}")
    }
    // split: both methods label zero/one docs without error
    for ((t, n) <- Seq(("empty", 0L), ("one", 1L)); m <- Seq("hash", "leakfree")) {
      val s1 = call(s"CALL graft_dg.system.split(table => 'db.$t', " +
        s"method => '$m', output_table => 'db.${t}_$m')")
      assert(s1.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).head === n,
        s"$t/$m split counts")
    }
    // score / chunk / pack: empty in = empty out; single doc scores/chunks
    for ((t, n) <- Seq(("empty", 0L), ("one", 1L))) {
      val sc = call(s"CALL graft_dg.system.score(table => 'db.$t', " +
        s"metrics => 'quality,langid,fingerprint', output_table => 'db.${t}_s')")
      assert(sc.head.getLong(1) === n, s"$t score rows")
      val ch = call(s"CALL graft_dg.system.chunk(table => 'db.$t', " +
        s"output_table => 'db.${t}_c')")
      assert(ch.head.getLong(1) === n, s"$t chunk rows") // 3 tokens = 1 window
      assert(call(s"CALL graft_dg.system.pack(table => 'db.$t', budget => 2048)").length
        === n.toInt, s"$t pack rows")
    }
  }
}
