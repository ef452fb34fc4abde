package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("text_commonness: exact counts on an engineered micro-corpus") {
    // corpus counts: a=4 (3 in d1, 1 in d2), b=1, c=1
    val tmp = java.nio.file.Files.createTempDirectory("graft-common-").toString
    import spark.implicits._
    Seq(1L -> "a a a", 2L -> "a b", 3L -> "c")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("text_commonness")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === ((3L, 4.0, 4L, 1.0)))      // mean 4, min 4
    assert(got(2L) === ((2L, 2.5, 1L, 1.0)))      // (4+1)/2
    assert(got(3L) === ((1L, 1.0, 1L, 1.0)))
  }

  test("text_compress_ratio: lengths == fresh-Deflater reference; bands; map-only plan") {
    // corpus equivalence: the codegen'd thread-local-Deflater expression
    // must equal a FRESH Deflater per doc computed driver-side
    def ref(bytes: Array[Byte]): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val got = SparkEntry.queries("text_compress_ratio")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      val (nb, nd, ratio) = got(r.getLong(0))
      assert(nb === bytes.length.toLong)
      assert(nd === ref(bytes), s"doc ${r.getLong(0)}")
      assert(ratio === math.rint(nd.toDouble / nb * 1e6) / 1e6)
    }

    // engineered bands: pure repetition lands "repetitive", prose "natural"
    val tmp = java.nio.file.Files.createTempDirectory("graft-deflate-").toString
    import spark.implicits._
    val prose = "Deduplication pipelines for large language model corpora " +
      "typically begin with exact hashing, then move to locality sensitive " +
      "sketches that group near duplicates into buckets. Careful engineers " +
      "cap every bucket, because adversarial or boilerplate content can " +
      "otherwise inflate a single key until one straggler task owns the " +
      "whole join. Finally the surviving documents are scored for quality, " +
      "packed into fixed token budgets, and shuffled into shards so that " +
      "training order stays deterministic across reruns of the same seed."
    Seq(1L -> ("spam " * 400), 2L -> prose) // prose deflates to ~0.60
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val bands = SparkEntry.queries("text_compress_ratio")(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(bands(1L) === "repetitive")
    assert(bands(2L) === "natural")

    // one map stage: no Exchange before the presentation sort
    val plan = Tables.t(spark, sf, "documents")
      .withColumn("n", graft.functions.deflate_len(col("text")))
      .select("doc_id", "n")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"deflate plan shuffles:\n$plan")
    assert(plan.contains("*(1) Project"), s"deflate fell out of codegen:\n$plan")
  }

  test("corpus_drift: χ² == plain-Scala recompute; skewed source outranks a representative one; one counts shuffle") {
    // 1) full independent recompute on the real corpus: own tokenizer,
    // own per-gram rolling hash, own counts, own χ² in the SAME IEEE
    // operation order the column expression declares
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val B = 1024
    def grams(text: String): Seq[String] = {
      val w = text.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => a + " " + b }
    }
    def bucket(g: String): Int = {
      var h = 0L; var i = 0
      while (i < g.length) {
        val cp = g.codePointAt(i)
        h = (h * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      (h % B).toInt
    }
    val counts = scala.collection.mutable.Map[(String, Int), Long]().withDefaultValue(0L)
    docs.foreach { case (src, text) =>
      grams(text).foreach(g => counts((src, bucket(g))) += 1) }
    val totS = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val cAll = counts.groupBy(_._1._2).map { case (h, m) => h -> m.values.sum }
    val totAll = cAll.values.sum
    val expected = totS.keys.toSeq.sorted.map { src =>
      val tnanos = (0 until B).map { h =>
        val ps = (counts((src, h)) + 1).toDouble / (totS(src) + B)
        val pa = (cAll.getOrElse(h, 0L) + 1).toDouble / (totAll + B)
        math.round((ps - pa) * (ps - pa) / pa * 1e9)
      }
      (src, totS(src),
        BigDecimal(tnanos.sum.toDouble / 1e9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SparkEntry.queries("corpus_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)

    // 2) direction on an engineered corpus. The representative source
    // must match the CORPUS mix (which all sources jointly define), so:
    // srcA = 4α+4β docs, srcB = 2β, srcC = 2α → corpus = 6α+6β = exactly
    // srcA's 50/50 mix. srcA's χ² is smoothing noise only; the two
    // skewed sources must each carry a decisively larger divergence.
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift-").toString
    import spark.implicits._
    val alpha = Seq.fill(10)("alpha").mkString(" ")
    val beta = Seq.fill(10)("beta").mkString(" ")
    ((1L to 8L).map(i => (i, "srcA", "xx", if (i % 2 == 0) alpha else beta)) ++
      Seq((11L, "srcB", "xx", beta), (12L, "srcB", "xx", beta),
        (21L, "srcC", "xx", alpha), (22L, "srcC", "xx", alpha)))
      .toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val drift = SparkEntry.queries("corpus_drift")(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(drift("srcB") > drift("srcA") * 2 && drift("srcC") > drift("srcA") * 2,
      s"skewed sources not flagged: $drift")

    // 3) plan: ONE (source, h) counts shuffle with map-side partials; the
    // scaffold/corpus joins are B-bounded and the 1-row total broadcasts
    val plan = SparkEntry.queries("corpus_drift")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"counts aggregation lost its map-side partial:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"1-row corpus total not broadcast:\n$plan")
  }

  test("driftPair: identical snapshots give exactly zero; same-distribution growth stays near zero; a shifted source flags") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // counts at realistic gram-mass scale: with toy totals (~15 grams)
    // the add-1 smoothing over 1024 buckets dominates both signals and
    // growth-vs-shift compresses to ~5× — at corpus scale the prior is
    // negligible and the separation is orders of magnitude
    val old = Seq(("a", 1, 10000L), ("a", 2, 5000L), ("b", 3, 7000L))
      .toDF("source", "h", "c")
    // identity: pn == po bucket-for-bucket → every nano term rounds from
    // exactly 0.0 — the report must read 0.0, not epsilon
    val same = TextAnalysis.driftPair(old, old).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(same.toSeq === Seq(("a", 15000L, 15000L, 0.0), ("b", 7000L, 7000L, 0.0)))
    // 3× growth with the SAME shape: only the add-1 smoothing moves — the
    // χ² must stay tiny
    val grown = TextAnalysis.driftPair(old,
      old.withColumn("c", col("c") * 3)).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // source a's mass moves wholly from buckets {1,2} to bucket 9 — a
    // real content shift; b unchanged
    val shifted = TextAnalysis.driftPair(old,
      Seq(("a", 9, 15000L), ("b", 3, 7000L)).toDF("source", "h", "c")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(shifted("a") > grown("a") * 100,
      s"content shift not separated from growth: shift=${shifted("a")} grown=${grown("a")}")
    assert(shifted("b") === 0.0)
  }

  test("CALL system.drift: cross-table report matches driftPair; missing reference fails fast") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_dr",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dr.warehouse",
      java.nio.file.Files.createTempDirectory("graft-dr-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dr.db")
    val alpha = Seq.fill(12)("alpha").mkString(" ")
    val beta = Seq.fill(12)("beta").mkString(" ")
    Seq((1L, "a", alpha), (2L, "a", alpha), (3L, "b", beta))
      .toDF("doc_id", "cat", "body").createOrReplaceTempView("dr_old")
    Seq((1L, "a", alpha), (2L, "a", alpha), (3L, "b", alpha), (4L, "b", alpha))
      .toDF("doc_id", "cat", "body").createOrReplaceTempView("dr_new")
    spark.sql("CREATE TABLE graft_dr.db.o AS SELECT * FROM dr_old")
    spark.sql("CREATE TABLE graft_dr.db.n AS SELECT * FROM dr_new")
    val got = spark.sql(
      "CALL graft_dr.system.drift(table => 'db.n', reference_table => 'db.o', " +
        "source_column => 'cat', text_column => 'body')").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // independent: the driftPair tail over the same renamed inputs
    val expected = graft.operators.TextAnalysis.driftPair(
      graft.operators.TextAnalysis.driftCounts(
        spark.table("dr_old").select(col("cat").as("source"), col("body").as("text"))),
      graft.operators.TextAnalysis.driftCounts(
        spark.table("dr_new").select(col("cat").as("source"), col("body").as("text"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq === expected.toSeq)
    // source 'a' unchanged → exactly 0; source 'b' flipped beta→alpha → flagged
    val byCat = got.map(r => r._1 -> r._4).toMap
    assert(byCat("a") === 0.0 && byCat("b") > 0.1, s"direction wrong: $byCat")
    val e = intercept[Exception](spark.sql(
      "CALL graft_dr.system.drift(table => 'db.n', reference_table => '')").collect())
    assert(e.getMessage.contains("reference_table"))
  }

  test("q_stream_drift: maintained count table report == batch corpus_drift row-for-row") {
    // counts are additive, so stream-end state == the batch aggregation
    // exactly and the shared report tail must reproduce the batch answer
    val streamed = SparkEntry.queries("q_stream_drift")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("corpus_drift")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("corpus_stats: exact rank percentiles + corpus-wide dup flags (engineered corpus)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cstats-").toString
    import spark.implicits._
    Seq(
      (1L, "A", "w1"),
      (2L, "A", "w1 w2"),
      (3L, "A", "w1 w2 w3"),
      (4L, "A", "w1 w2 w3 w4"),
      (5L, "A", "dup dup dup dup dup"),
      (6L, "B", "dup dup dup dup dup"), // exact copy of doc 5, other source
      (7L, "B", "z z z"))
      .toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("corpus_stats")(spark, tmp).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))))
      .toMap
    val (aDocs, aToks, aP50, aP90, aQ, aDup) = got("A")
    assert((aDocs, aToks) === ((5L, 15L)))
    assert(aP50 === 3L) // rank ceil(0.5*5)=3 over sorted lengths 1,2,3,4,5
    assert(aP90 === 5L) // rank ceil(0.9*5)=5
    assert(aDup === 1L) // doc 5's text recurs (in B) — corpus-wide flag
    assert(aQ > 0.0 && aQ < 1.0)
    val (bDocs, bToks, bP50, bP90, _, bDup) = got("B")
    assert((bDocs, bToks) === ((2L, 8L)))
    assert(bP50 === 3L) // rank 1 of lengths 3,5
    assert(bP90 === 5L) // rank 2
    assert(bDup === 1L)
  }

  test("text_tokens_bpe: lossless roundtrip over the corpus; scanner == pretokenizer regex") {
    import graft.functions.Bpe
    val texts = Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val pretok = (" ?[a-zA-Z]+| ?[0-9]+| ?[^ \\t\\n\\x0B\\f\\ra-zA-Z0-9]+" +
      "|[ \\t\\n\\x0B\\f\\r]+").r
    texts.foreach { t =>
      // decode ∘ encode = identity, byte-exact — BPE only regroups bytes
      assert(java.util.Arrays.equals(Bpe.decode(Bpe.encode(t)), t.getBytes("UTF-8")),
        s"roundtrip failed for: ${t.take(60)}")
      // the byte scanner is exactly the documented leftmost-first regex
      val bytes = t.getBytes("UTF-8")
      val scanned = Iterator.unfold(0)(i =>
        if (i >= bytes.length) None
        else { val end = Bpe.tokenEnd(bytes, i)
               Some((new String(bytes, i, end - i, "UTF-8"), end)) }).toList
      assert(scanned === pretok.findAllIn(t).toList, s"scanner != regex for: ${t.take(60)}")
    }
    // merges actually compress: strictly fewer tokens than bytes overall
    val enc = texts.map(Bpe.encode(_).length.toLong)
    assert(enc.sum < texts.map(_.getBytes("UTF-8").length.toLong).sum / 2,
      "merge table produced no real compression")
    // production-scale vocabulary (r15): 256 bytes + 8192 merges, and its
    // decode closure holds (every token's bytes = left ++ right concat is
    // enforced by construction in Bpe.vocab — spot-check the deepest id)
    assert(Bpe.vocabSize === 256 + 8192, s"vocab size ${Bpe.vocabSize}")
    // common corpus words become single tokens under a realistic vocab:
    // bytes-per-token well above 2 (the 127-merge table plateaued ~2.3)
    val bpt = texts.map(_.getBytes("UTF-8").length.toLong).sum.toDouble / enc.sum
    assert(bpt > 3.0, s"bytes/token $bpt not production-shaped")
  }

  test("text_tokens_bpe: codegen'd expression == driver-side reference; plan is exchange-free") {
    import graft.functions.Bpe
    val viaExpr = SparkEntry.queries("text_tokens_bpe")(spark, sf)
      .select("doc_id", "n_bpe_tokens", "bpe_id_hash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaDriver = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val ids = Bpe.encode(r.getString(1))
        val h = ids.foldLeft(0L)((a, id) => (a * 31 + id) % 1000000007L)
        (r.getLong(0), ids.length.toLong, h)
      }.sortBy(_._1)
    assert(viaExpr.toSeq === viaDriver.toSeq)
    // the operator is a pure map stage: no Exchange before the
    // presentation sort (drop the orderBy to see the compute plan)
    val plan = Tables.t(spark, sf, "documents")
      .withColumn("st", graft.functions.bpe_stats(col("text")))
      .select(col("doc_id"), col("st").getItem(0).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE counting plan shuffles:\n$plan")
    // "*(n)" prefixes mark whole-stage-codegen'd operators in treeString
    assert(plan.contains("*(1) Project"), s"BPE projection fell out of codegen:\n$plan")
  }

  test("text_chunk_bpe: chunk windows == driver-side Bpe.encode reference; map-only plan") {
    import graft.functions.Bpe
    val got = SparkEntry.queries("text_chunk_bpe")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expected = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect().flatMap { r =>
      val ids = Bpe.encode(r.getString(1))
      val starts = if (ids.isEmpty) Seq.empty
        else 0 to (if (ids.length <= 64) 0 else (ids.length - 64 + 47) / 48 * 48) by 48
      starts.zipWithIndex.map { case (from, w) =>
        val chunk = ids.slice(from, from + 64)
        val bytes = chunk.map(Bpe.vocab(_).length.toLong).sum
        val h = chunk.foldLeft(0L)((a, id) => (a * 31 + id) % 1000000007L)
        (r.getLong(0), w.toLong) -> ((chunk.length.toLong, bytes, h))
      }
    }.toMap
    assert(got === expected)
    // chunking is one map stage: no Exchange before the presentation sort
    val plan = Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        posexplode(graft.functions.bpe_chunks(col("text"), 64, 48)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE chunking plan shuffles:\n$plan")
  }

  test("text_pack_bpe: packs == driver-side reference over BPE counts") {
    import graft.functions.Bpe
    val counts = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Bpe.encode(r.getString(1)).length.toLong)
    // mirror pack(): shard = doc_id % 8, order by doc_id, prefix-sum start,
    // pack = floor(start / 2048)
    val expected = counts.groupBy(_._1 % 8).flatMap { case (shard, docs) =>
      val sorted = docs.sortBy(_._1)
      val starts = sorted.map(_._2).scanLeft(0L)(_ + _).init
      sorted.zip(starts).map { case ((id, n), st) => (shard, st / 2048, id, n) }
        .groupBy { case (_, p, _, _) => p }
        .map { case (p, rows) =>
          (shard, p) -> ((rows.length.toLong, rows.map(_._4).sum,
            rows.map(_._3).min))
        }
    }
    val got = SparkEntry.queries("text_pack_bpe")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected)
  }

  test("text_keywords: exact tf-idf on an engineered micro-corpus; pre-shuffle top-k plan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-kw-").toString
    import spark.implicits._
    // 3 docs: "rare" appears only in d1 (df=1), "common" in all (df=3)
    Seq(1L -> "rare common common", 2L -> "common word", 3L -> "common word")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("text_keywords")(spark, tmp)
    val byDoc = got.collect().groupBy(_.getLong(0))
    // d1: rare tf=1 df=1 → 1*(4)/(2)=2.0 ; common tf=2 df=3 → 2*4/4=2.0
    // tie at 2.0 → term ASC puts "common" first
    val d1 = byDoc(1L).map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(d1.toSeq === Seq(("common", 2.0, 1L), ("rare", 2.0, 2L)))
    // d2: common 1*4/4=1.0, word 1*4/3≈1.333333 → word ranks first
    val d2 = byDoc(2L).map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(d2.toSeq === Seq(("word", 1.333333, 1L), ("common", 1.0, 2L)))
    // the per-doc rank filter must be rewritten to a pre-shuffle k-heap
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-k not rewritten to a partial heap:\n$plan")
  }

  test("text_search_bm25: hand-computed scores on a micro-corpus; broadcast + k-heap plan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-").toString
    import spark.implicits._
    // query-vocab terms only: q1 = (spark, vector); N=3, sum_dl=7
    Seq(1L -> "spark spark data", 2L -> "spark table", 3L -> "vector table")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    // independent recomputation of the rational-BM25 formula in plain Scala
    def score(terms: Seq[(Long, Long)], dl: Long): Double = { // (tf, df) per matched term
      val n = 3L; val avg = 7.0 / n
      val micro = terms.map { case (tf, df) =>
        val idf = ((n.toDouble - df) + 0.5) / (df + 0.5)
        val tfn = (tf.toDouble * 2.2) / (tf.toDouble + (1.2 * (0.25 + ((0.75 * dl.toDouble) / avg))))
        val s = BigDecimal(idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        math.rint(s * 1e6).toLong
      }.sum
      BigDecimal(micro.toDouble / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = SparkEntry.queries("text_search_bm25")(spark, tmp).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // df(spark)=2, df(vector)=1; d3's lone vector hit out-idfs the spark docs
    val exp = Seq(
      3L -> score(Seq((1L, 1L)), 2),  // vector tf=1
      1L -> score(Seq((2L, 2L)), 3),  // spark tf=2
      2L -> score(Seq((1L, 2L)), 2))  // spark tf=1
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, 1L, s, (i + 1).toLong) }
    assert(got.toSeq === exp)

    // plan: DF + query-table joins broadcast; per-query top-k is a
    // pre-shuffle k-heap
    val plan = SparkEntry.queries("text_search_bm25")(spark, tmp)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"DF/query joins not broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k not rewritten to a partial heap:\n$plan")
  }

  test("text_search_hybrid: RRF fuses the two arms' ranks — both-arm docs beat single-arm peers; plan stays broadcast + k-heap") {
    import operators.TextAnalysis.{Bm25TopK, RrfK}
    val lex = SparkEntry.queries("text_search_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap // (q, doc) -> rank
    val got = SparkEntry.queries("text_search_hybrid")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.length === 3 * Bm25TopK)
    // independent RRF recomputation: fused == sum of 1/(60+r) over the doc's
    // arm memberships, with the vector arm recomputed from raw cosines
    val e = Tables.t(spark, sf, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb)) // VectorDistance's exact form
    }
    val vecRanks = operators.TextAnalysis.HybridQueryVecs.flatMap { case (q, qvId) =>
      val qv = e(qvId)
      e.toSeq.map { case (id, v) =>
        (id, BigDecimal(cos(v, qv)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
        .sortBy { case (id, c) => (-c, id) }.take(Bm25TopK)
        .zipWithIndex.map { case ((id, _), i) => (q, id) -> (i + 1).toLong }
    }.toMap
    got.foreach { case (q, doc, nArms, rrf, _) =>
      val arms = Seq(lex.get((q, doc)), vecRanks.get((q, doc))).flatten
      assert(arms.nonEmpty && arms.size === nArms,
        s"($q,$doc) n_arms=$nArms but independent arms=$arms")
      val expect = BigDecimal(arms.map(r => 1.0 / (RrfK + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - expect) < 1e-9, s"($q,$doc) rrf=$rrf expected=$expect")
    }
    // a doc ranked in BOTH arms must outrank any doc whose single arm gave
    // it an equal-or-worse rank (the fusion property the key exists for)
    val byQ = got.groupBy(_._1)
    byQ.values.foreach { rows =>
      val both = rows.filter(_._3 == 2L).map(_._5)
      val single = rows.filter(_._3 == 1L).map(_._5)
      if (both.nonEmpty && single.nonEmpty)
        assert(both.min < single.max, s"two-arm doc did not outrank: $rows")
    }
    // plan: query vectors broadcast; both per-query top-k windows k-heap
    val plan = SparkEntry.queries("text_search_hybrid")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"hybrid top-k not rewritten to a partial heap:\n$plan")
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"query-vector/df joins not broadcast:\n$plan")
  }

  test("q_stream_hybrid: hybrid served from the two maintained indexes == batch text_search_hybrid row-for-row") {
    // the streamed key keeps both retrieval structures fresh (bid-guarded
    // text-index deltas + exactly-once cell-clustered vector appends) and
    // serves the SAME workload from them — streamed == batch is the whole
    // statement (both structures hold the full corpus at stream end)
    val streamed = SparkEntry.queries("q_stream_hybrid")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("text_search_hybrid")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("text_lm_score: engineered corpus hand-computed exactly; map-only scoring") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-").toString
    import spark.implicits._
    // d1 repeats the corpus-dominant transition a→b; d2 spends the same
    // 'a' prefix on six DIFFERENT rare continuations (so its transitions
    // are improbable under the corpus LM); d3 is a shorter copy of d1.
    // Corpus counts: C(ab)=6+3=9, C(ba)=5+2=7; d2 contributes aq,aw,az,
    // ae,ay,aj (1 each, all 'a'-prefixed) and qa,wa,za,ea,ya (1 each,
    // own prefixes). C1('a') = 9+6 = 15, C1('b') = 7.
    //  p(ab)=9/15=0.6, p(ba)=1.0, p(a?)=1/15, p(?a)=1.0
    //  d1 = (6·0.6 + 5·1.0)/11      = 0.781818…
    //  d2 = (6·(1/15) + 5·1.0)/11   = 0.490909…  (nano-rounded)
    //  d3 = (3·0.6 + 2·1.0)/5       = 0.76
    Seq(1L -> "abababababab", 2L -> "aqawazaeayaj", 3L -> "ababab")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val df = SparkEntry.queries("text_lm_score")(spark, tmp)
    val rows = df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(1L)._1 === 11L && rows(2L)._1 === 11L && rows(3L)._1 === 5L)
    assert(rows(1L)._2 === 0.781818)
    assert(rows(2L)._2 === 0.490909)
    assert(rows(3L)._2 === 0.76)
    // since r14 second half the scoring is a codegen'd expression over the
    // collected LM table — no join at all: the only exchange in the plan
    // is the presentation ORDER BY (rangepartitioning), never a
    // corpus-shuffling hashpartitioning
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"LM scoring shuffled the corpus:\n$plan")
    assert(!plan.contains("Join"), s"LM scoring should not join:\n$plan")
  }

  test("text_commonness plan: Zipf head joins broadcast; tok shuffles bounded") {
    val plan = SparkEntry.queries("text_commonness")(spark, sf)
      .queryExecution.executedPlan.toString
    // the skewed keys (the frequency head) must be absorbed by a broadcast
    // join, never a shuffled join keyed on the Zipf distribution
    assert(plan.contains("BroadcastHashJoin"),
      s"frequency head not broadcast:\n$plan")
    // tok-keyed exchanges: the dictionary groupBy (reused by head+tail via
    // ReusedExchange) + the tail join's probe-side exchange
    val tokShuffles = "hashpartitioning\\(tok#".r.findAllMatchIn(plan).size
    assert(tokShuffles <= 3,
      s"token stream shuffled $tokShuffles times on tok:\n$plan")
  }

  test("text_search_indexed: index-served results == scan-side BM25 exactly; standing index, no re-tokenize") {
    val scan = SparkEntry.queries("text_search_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val fromIdx = SparkEntry.queries("text_search_indexed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(fromIdx.toSeq === scan.toSeq)
    assert(fromIdx.nonEmpty)

    // the SEARCH plan must read the standing postings table, not rebuild
    // it: no Generate (the tokenizing explode lives only in build) and no
    // parquet corpus scan — every scan in the plan is a lance index read
    val df = SparkEntry.queries("text_search_indexed")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"index search re-tokenized:\n$plan")
    assert(!plan.contains("documents.parquet"), s"index search scanned the corpus:\n$plan")

    // standing: a second serving leaves the index untouched (same
    // manifest version — nothing was rebuilt or appended)
    val root = graft.operators.TextIndex.indexFor(spark, sf)
    def version: Long = {
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      graft.sources.lance.ManifestIO.loadLatest(root + "/postings", conf).get.version
    }
    val v1 = version
    SparkEntry.queries("text_search_indexed")(spark, sf).collect()
    assert(version === v1, "second serving modified the standing index")
  }

  test("text_search_indexed_multi: K disjoint batches from ONE build — batch 0 == single-batch key, index untouched") {
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
    val root = graft.operators.TextIndex.indexFor(spark, sf)
    def version: Long =
      graft.sources.lance.ManifestIO.loadLatest(root + "/postings", conf).get.version
    val v1 = version
    val multi = SparkEntry.queries("text_search_indexed_multi")(spark, sf).collect()
    // serving three workloads neither rebuilt nor appended to the index
    assert(version === v1, "multi-batch serving modified the standing index")
    // batch 0 is the Bm25Queries workload — it must reproduce the
    // single-batch key row-for-row (same index, same scoring tree)
    val single = SparkEntry.queries("text_search_indexed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val batch0 = multi.filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(batch0.toSeq === single.toSeq)
    // each batch answered its own workload (disjoint vocabularies → every
    // batch finds hits in this corpus)
    val batches = multi.map(_.getLong(0)).distinct.sorted
    assert(batches.toSeq === Seq(0L, 1L, 2L))
    // serving stays index-only for every batch: no tokenize, no corpus scan
    val plan = SparkEntry.queries("text_search_indexed_multi")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"multi search re-tokenized:\n$plan")
    assert(!plan.contains("documents.parquet"), s"multi search scanned the corpus:\n$plan")
  }

  test("CALL system.search: builds the sidecar once, serves the workload, materializes") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.lance_ts",
      classOf[graft.sources.lance.LanceCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("graft-ts-wh-").toString
    spark.conf.set("spark.sql.catalog.lance_ts.warehouse", wh)
    spark.sql("CREATE NAMESPACE lance_ts.db")
    // corpus + query workload as catalog lance tables
    spark.sql("CREATE TABLE lance_ts.db.c (doc_id BIGINT, text STRING)")
    Tables.t(spark, sf, "documents").select("doc_id", "text")
      .write.format("lance").mode("append").save(s"$wh/db/c")
    spark.sql("CREATE TABLE lance_ts.db.qq (query_id BIGINT, term STRING)")
    Seq((1L, "spark"), (1L, "vector"), (2L, "merge"), (2L, "stream"), (2L, "hash"))
      .toDF("query_id", "term")
      .write.format("lance").mode("append").save(s"$wh/db/qq")

    val got = spark.sql(
      "CALL lance_ts.system.search(queries => 'db.qq', corpus => 'db.c', k => 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 <= 3))
    // per query: ranks are 1..n contiguous
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // the sidecar exists and a second CALL reuses it (same version)
    val idxRoot = graft.operators.TextIndex.indexRootFor(s"$wh/db/c")
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
    assert(graft.operators.TextIndex.exists(idxRoot, conf))
    val v1 = graft.sources.lance.ManifestIO.loadLatest(idxRoot + "/postings", conf).get.version
    val again = spark.sql(
      "CALL lance_ts.system.search(queries => 'db.qq', corpus => 'db.c', k => 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(again.toSeq === got.toSeq)
    assert(graft.sources.lance.ManifestIO.loadLatest(idxRoot + "/postings", conf).get.version === v1)
    // materialized form
    val mat = spark.sql(
      "CALL lance_ts.system.search(queries => 'db.qq', corpus => 'db.c', k => 3, " +
        "output_table => 'db.hits')").collect()(0)
    assert(mat.getString(0) === "db.hits")
    assert(spark.sql("SELECT count(*) FROM lance_ts.db.hits").first().getLong(0) === mat.getLong(1))

    // STALENESS: the corpus moves (append a doc made entirely of one query
    // term) — the next CALL must rebuild the sidecar and surface the new
    // doc, not serve the stale index
    Seq((999999L, "zzzquery zzzquery zzzquery")).toDF("doc_id", "text")
      .write.format("lance").mode("append").save(s"$wh/db/c")
    Seq((7L, "zzzquery")).toDF("query_id", "term")
      .write.format("lance").mode("append").save(s"$wh/db/qq")
    val fresh = spark.sql(
      "CALL lance_ts.system.search(queries => 'db.qq', corpus => 'db.c', k => 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fresh.contains((7L, 999999L)),
      s"appended doc invisible — stale sidecar served after the corpus moved: ${fresh.toSeq}")
    assert(graft.sources.lance.ManifestIO.loadLatest(idxRoot + "/postings", conf).get.version > v1,
      "sidecar was not rebuilt after the corpus version advanced")
  }

  test("q_stream_text_index: streamed index == batch index; per-table bid guard makes replays no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_stream_text_index")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val scan = SparkEntry.queries("text_search_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === scan.toSeq)

    // replay guard: re-appending the same batch id changes nothing; a new
    // batch id appends exactly its delta
    val root = java.nio.file.Files.createTempDirectory("graft-stidx-spec-").toString
    val b1 = Seq((1L, "alpha beta beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha alpha")).toDF("doc_id", "text")
    operators.TextIndex.appendDelta(spark, b1, root, 0L)
    def counts = (
      spark.read.format("lance").load(root + "/postings").count(),
      spark.read.format("lance").load(root + "/terms").count(),
      spark.read.format("lance").load(root + "/stats").count())
    val c1 = counts
    operators.TextIndex.appendDelta(spark, b1, root, 0L) // at-least-once replay
    assert(counts === c1, "replayed batch must be a per-table no-op")
    operators.TextIndex.appendDelta(spark, b2, root, 1L)
    val c2 = counts
    assert(c2._1 === c1._1 + 1) // one new (alpha, doc 3) posting
    assert(c2._3 === c1._3 + 1) // one stats generation per batch
    // generation-folded search: df(alpha)=2 across generations, n_docs=3
    val q = Seq((7L, "alpha")).toDF("query_id", "term")
    val hits = operators.TextIndex.search(spark, root, q, 5).collect()
    assert(hits.map(_.getLong(1)).toSet === Set(1L, 3L))
    // compaction folds generations without moving the answer
    operators.TextIndex.compact(spark, root)
    val c3 = counts
    assert(c3._3 === 1L, "stats generations must fold to one row")
    assert(c3._1 === c2._1, "postings row count unchanged by compaction")
    val hits2 = operators.TextIndex.search(spark, root, q, 5).collect()
    assert(hits2.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq ===
      hits.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq)
  }

  test("TextIndex.build stamps bid=0: a procedure-built root takes streaming deltas and compacts") {
    import spark.implicits._
    // build() and appendDelta() share one root naming (indexRootFor); a
    // built index later fed deltas/compaction must not die on an
    // unresolved `bid` column, and build's generation stamp must read as
    // high-water 0 (a delta with bid=0 is a replay no-op, bid=1 appends)
    val root = java.nio.file.Files.createTempDirectory("graft-bidx-spec-").toString
    val b1 = Seq((1L, "alpha beta beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha alpha")).toDF("doc_id", "text")
    operators.TextIndex.build(spark, b1, root)
    def counts = (
      spark.read.format("lance").load(root + "/postings").count(),
      spark.read.format("lance").load(root + "/terms").count(),
      spark.read.format("lance").load(root + "/stats").count())
    val c1 = counts
    operators.TextIndex.appendDelta(spark, b1, root, 0L) // replays against build's stamp
    assert(counts === c1, "bid=0 delta on a built root must be a no-op")
    operators.TextIndex.appendDelta(spark, b2, root, 1L)
    assert(counts._1 === c1._1 + 1)
    // the mixed-provenance index answers identically to a fresh build
    val q = Seq((7L, "alpha")).toDF("query_id", "term")
    val mixed = operators.TextIndex.search(spark, root, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val root2 = java.nio.file.Files.createTempDirectory("graft-bidx2-spec-").toString
    operators.TextIndex.build(spark, b1.unionByName(b2), root2)
    val fresh = operators.TextIndex.search(spark, root2, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(mixed === fresh)
    operators.TextIndex.compact(spark, root) // max("bid") resolves on built roots
    val folded = operators.TextIndex.search(spark, root, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(folded === fresh)
  }

  test("text_contamination_ratio: containment is benchmark-relative, not absolute") {
    // The asymmetric rule: a benchmark item pasted inside a LONG corpus doc
    // keeps containment 1.0 even though the absolute/Jaccard overlap is
    // small relative to the corpus doc's own shingle set.
    val tmp = java.nio.file.Files.createTempDirectory("graft-contain-").toString
    import spark.implicits._
    Seq(
      20L -> "q1 q2 q3 q4 q5",                      // bench: 3 shingles
      40L -> "z1 z2 z3",                            // bench: 1 shingle
      1L  -> "f1 f2 q1 q2 q3 q4 q5 f3 f4 f5 f6",    // contains ALL 3 -> 1.0
      2L  -> "q1 q2 q3 x y",                        // 1 of 3 -> 0.333 excluded
      3L  -> "z1 z2 z3 extra words here",           // 1 of 1 vs bench 40 -> 1.0
      4L  -> "nothing shared at all")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("text_contamination_ratio")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got === Seq(
      (1L, 20L, 3L, 3L, 1.0),
      (3L, 40L, 1L, 1L, 1.0)))
  }

  test("q_stream_contamination: streamed quarantine == batch text_contamination row-for-row") {
    def rows(key: String) = SparkEntry.queries(key)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows("q_stream_contamination") === rows("text_contamination"))
  }

  test("CALL system.decontaminate: both rules flag, survivors materialize whole-row, summary counts") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_dec",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dec.warehouse",
      java.nio.file.Files.createTempDirectory("graft-dec-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dec.db")
    // bench: one long item (absolute-overlap rule), one short (containment)
    Seq(
      (100L, "q1 q2 q3 q4 q5 q6", "b"),   // 4 shingles
      (101L, "z1 z2 z3", "b"))            // 1 shingle
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("dec_bench_src")
    Seq(
      (1L, "q1 q2 q3 q4 q5 q6 tail words here", "a"), // overlap 4 >= 3 → flagged
      (2L, "f1 z1 z2 z3 f2 f3 f4 f5 f6 f7 f8", "a"),  // overlap 1, containment 1/1 → flagged
      (3L, "q1 q2 q3 x y", "a"),                      // overlap 1, containment 0.25 → survives
      (4L, "nothing shared at all", "a"))             // survives
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("dec_corpus_src")
    spark.sql("CREATE TABLE graft_dec.db.dec_bench AS SELECT * FROM dec_bench_src")
    spark.sql("CREATE TABLE graft_dec.db.dec_corpus AS SELECT * FROM dec_corpus_src")
    val summary = spark.sql(
      "CALL graft_dec.system.decontaminate(corpus => 'db.dec_corpus', " +
        "bench => 'db.dec_bench', min_overlap => 3, min_containment => 0.5, " +
        "output_table => 'db.dec_clean')").collect()
    assert(summary.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("db.dec_clean", 2L, 2L)))
    val out = spark.table("graft_dec.db.dec_clean")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (3L, "q1 q2 q3 x y", "a"),
      (4L, "nothing shared at all", "a")))
    // output_table is required — the survivor set must write distributed
    val e = intercept[Exception](spark.sql(
      "CALL graft_dec.system.decontaminate(corpus => 'db.dec_corpus', " +
        "bench => 'db.dec_bench', output_table => '')").collect())
    assert(e.getMessage.contains("output_table"))
  }

  test("CALL system.decontaminate: the semantic arm drops a paraphrase that shares no shingles") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_dec2",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dec2.warehouse",
      java.nio.file.Files.createTempDirectory("graft-dec2-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_dec2.db")
    // corpus rows carry text AND an embedding; doc 1 is a PARAPHRASE of the
    // bench item — zero shared shingles, near-identical embedding
    Seq(
      (1L, "totally different words entirely", Array(0.99f, 0.1f, 0f, 0f)),
      (2L, "unrelated text and direction", Array(0f, 0f, 1f, 0f)))
      .toDF("doc_id", "text", "emb").createOrReplaceTempView("dec2_corpus_src")
    Seq((100L, "the original benchmark item here", "x"))
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("dec2_bench_src")
    // the bench vectors live under a DIFFERENT column name — exercised via
    // bench_embedding_column below
    Seq(Tuple1(Array(1f, 0f, 0f, 0f)))
      .toDF("bench_vec").createOrReplaceTempView("dec2_bemb_src")
    spark.sql("CREATE TABLE graft_dec2.db.c AS SELECT * FROM dec2_corpus_src")
    spark.sql("CREATE TABLE graft_dec2.db.b AS SELECT * FROM dec2_bench_src")
    spark.sql("CREATE TABLE graft_dec2.db.be AS SELECT * FROM dec2_bemb_src")
    val summary = spark.sql(
      "CALL graft_dec2.system.decontaminate(corpus => 'db.c', bench => 'db.b', " +
        "embedding_column => 'emb', bench_embeddings => 'db.be', " +
        "bench_embedding_column => 'bench_vec', " +
        "min_cosine => 0.9, output_table => 'db.clean')").collect()
    assert(summary.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 1L)))
    assert(spark.table("graft_dec2.db.clean").collect().map(_.getLong(0)).toSeq
      === Seq(2L))
    // a half-armed semantic rule fails fast
    val e = intercept[Exception](spark.sql(
      "CALL graft_dec2.system.decontaminate(corpus => 'db.c', bench => 'db.b', " +
        "embedding_column => 'emb', output_table => 'db.clean2')").collect())
    assert(e.getMessage.contains("semantic arm"))
    // prescreen option plumbing (r18): every mode answers identically here
    // — the exact refine decides, and at d=4 'auto' gates the screen off
    // row-wise (4 < PrescreenMinDim) so the probabilistic bound is never
    // exposed to a low-dim corpus; an unknown value fails fast
    for ((mode, out) <- Seq("off" -> "db.clean3", "on" -> "db.clean4",
                            "auto" -> "db.clean5")) {
      spark.sql(
        "CALL graft_dec2.system.decontaminate(corpus => 'db.c', bench => 'db.b', " +
          "embedding_column => 'emb', bench_embeddings => 'db.be', " +
          "bench_embedding_column => 'bench_vec', min_cosine => 0.9, " +
          s"output_table => '$out', prescreen => '$mode')").collect()
      assert(spark.table(s"graft_dec2.$out").collect().map(_.getLong(0)).toSeq
        === Seq(2L), s"prescreen mode=$mode changed the survivor set")
    }
    val bad = intercept[Exception](spark.sql(
      "CALL graft_dec2.system.decontaminate(corpus => 'db.c', bench => 'db.b', " +
        "embedding_column => 'emb', bench_embeddings => 'db.be', " +
        "bench_embedding_column => 'bench_vec', min_cosine => 0.9, " +
        "output_table => 'db.cleanx', prescreen => 'fast')").collect())
    assert(bad.getMessage.contains("prescreen"))
  }

  test("q_stream_contamination: crash between quarantine append and checkpoint commit — replay no-ops") {
    // at-least-once hole: the quarantine append is durable, the checkpoint
    // commit marker is not; the replayed bid must not re-append its rows
    val out = java.nio.file.Files.createTempDirectory("graft-scont-cr-").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-scont-cr-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scont-cr-ck-").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    def run() = graft.operators.StreamingOps
      .streamContaminationAt(spark, docs, out, srcParts = 4, srcDir, ckpt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val first = run()
    assert(first.nonEmpty)
    val stateRows = spark.read.format("lance").load(out).count()
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    val replayed = run()
    assert(spark.read.format("lance").load(out).count() === stateRows,
      "replayed batch re-appended quarantine rows — the bid guard is broken")
    assert(replayed === first)
  }

  test("CALL system.score: each metric == its gated twin, metrics combine in one pass, errors fail fast") {
    spark.conf.set("spark.sql.catalog.graft_sc",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sc.warehouse",
      java.nio.file.Files.createTempDirectory("graft-sc-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sc.db")
    graft.Tables.t(spark, sf, "documents").select("doc_id", "text", "lang")
      .createOrReplaceTempView("sc_src")
    spark.sql("CREATE TABLE graft_sc.db.c AS SELECT * FROM sc_src")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    // one CALL carrying all three metric groups — each projection must
    // reproduce its gated twin row-for-row (quality's n_chars computes as
    // length(text) in the procedure and reads the stored count in the
    // twin; the fixture stores the true count, so they agree)
    val summary = spark.sql("CALL graft_sc.system.score(table => 'db.c', " +
      "metrics => 'quality,langid,fingerprint', label_column => 'lang', " +
      "output_table => 'db.s')").collect()
    assert(summary.head.getLong(1) === 500L)
    val scored = spark.table("graft_sc.db.s")
    for ((key, cols) <- Seq(
        "text_quality" -> Seq("doc_id", "n_chars", "n_tokens",
          "distinct_ratio", "stop_ratio", "quality"),
        "text_langid" -> Seq("doc_id", "score_en", "score_es", "score_de",
          "score_fr", "score_zh", "pred_lang", "lang", "is_match"),
        "text_fingerprint" -> Seq("doc_id", "fp", "fp_bucket"))) {
      val called = rowsOf(scored.select(cols.map(col): _*).orderBy("doc_id"))
      val gated = rowsOf(SparkEntry.queries(key)(spark, sf))
      assert(called === gated, s"scored projection diverged from gated $key")
    }
    // fail-fast: unknown metric, missing output_table
    val e1 = intercept[Exception](spark.sql(
      "CALL graft_sc.system.score(table => 'db.c', " +
        "metrics => 'quality,perplexity', output_table => 'db.x')").collect())
    assert(e1.getMessage.contains("metrics must be"))
    val e2 = intercept[Exception](spark.sql(
      "CALL graft_sc.system.score(table => 'db.c')").collect())
    assert(e2.getMessage.contains("output_table"))
  }

  test("CALL system.chunk/pack: counts == the gated twins, chunk_text is the real window, params parameterize") {
    import org.apache.spark.sql.functions.{col, size, split}
    spark.conf.set("spark.sql.catalog.graft_ck",
      classOf[graft.sources.lance.LanceCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ck.warehouse",
      java.nio.file.Files.createTempDirectory("graft-ck-wh-").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ck.db")
    graft.Tables.t(spark, sf, "documents").select("doc_id", "text")
      .createOrReplaceTempView("ck_src")
    spark.sql("CREATE TABLE graft_ck.db.c AS SELECT * FROM ck_src")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    // chunk at the gated 64/48 window: counts projection == text_chunk,
    // and chunk_text really is the window (its whitespace token count ==
    // chunk_tokens on every row)
    val sum1 = spark.sql("CALL graft_ck.system.chunk(table => 'db.c', " +
      "chunk_tokens => 64, stride => 48, output_table => 'db.ch')").collect()
    val chunks = spark.table("graft_ck.db.ch")
    assert(sum1.head.getLong(1) === chunks.count())
    assert(rowsOf(chunks.select("doc_id", "chunk_idx", "chunk_tokens", "chunk_chars")
        .orderBy("doc_id", "chunk_idx"))
      === rowsOf(SparkEntry.queries("text_chunk")(spark, sf)))
    assert(chunks.filter(
        size(split(col("chunk_text"), " ")) =!= col("chunk_tokens")).count() === 0L,
      "chunk_text token count diverges from chunk_tokens")
    // a wider stride yields fewer chunks
    spark.sql("CALL graft_ck.system.chunk(table => 'db.c', " +
      "chunk_tokens => 64, stride => 64, output_table => 'db.ch2')")
    assert(spark.table("graft_ck.db.ch2").count() < sum1.head.getLong(1))
    // pack at the gated budget/shards == text_pack; shards => 0 (cluster-
    // sized) still covers every doc's tokens exactly once
    val packed = rowsOf(spark.sql("CALL graft_ck.system.pack(table => 'db.c', " +
      "budget => 2048, shards => 8)").orderBy("shard", "pack_id"))
    assert(packed === rowsOf(SparkEntry.queries("text_pack")(spark, sf)))
    val auto = spark.sql("CALL graft_ck.system.pack(table => 'db.c', " +
      "budget => 2048)").collect()
    assert(auto.map(_.getLong(3)).sum === packed.map(_(3).asInstanceOf[Long]).sum,
      "auto-sharded pack lost or duplicated tokens")
    // fail-fast
    val e1 = intercept[Exception](spark.sql(
      "CALL graft_ck.system.chunk(table => 'db.c', chunk_tokens => 0, " +
        "output_table => 'db.x')").collect())
    assert(e1.getMessage.contains("must be positive"))
    val e2 = intercept[Exception](spark.sql(
      "CALL graft_ck.system.chunk(table => 'db.c')").collect())
    assert(e2.getMessage.contains("output_table"))
    val e3 = intercept[Exception](spark.sql(
      "CALL graft_ck.system.pack(table => 'db.c', budget => -1)").collect())
    assert(e3.getMessage.contains("budget must be positive"))
  }
}
