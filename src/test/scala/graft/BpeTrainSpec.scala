package graft

import graft.functions.Bpe
import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

/** Distributed BPE training (`bpe_train`): hand-computed merges,
  * histogram equivalence, determinism, and the word-cap order. */
class BpeTrainSpec extends SparkSpec {

  test("learn: hand-computed merges on an engineered histogram") {
    // "aaab"×2 + "ab"×1:
    //   round 0: (a,a) weight 4 beats (a,b) weight 3 → 256 = "aa"
    //   round 1: (a,b) weight 3 (aaab's tail 2 + ab 1) → 257 = "ab"
    //   round 2: (256,257) weight 2 → 258 = "aaab"
    val merges = BpeTrainer.learn(Seq(
      ("aaab".getBytes("UTF-8"), 2L), ("ab".getBytes("UTF-8"), 1L)), 5)
    assert(merges.map(m =>
      (m.rank, m.leftId, m.rightId, m.newId, m.pairCount, m.tokenHex)) === Seq(
      (0, 97, 97, 256, 4L, "6161"),
      (1, 97, 98, 257, 3L, "6162"),
      (2, 256, 257, 258, 2L, "61616162")))
  }

  test("learn: ties break by smallest (left, right) pair") {
    // "ab"×1 and "cd"×1 both count 1 → (a,b) < (c,d) wins round 0
    val merges = BpeTrainer.learn(Seq(
      ("cd".getBytes("UTF-8"), 1L), ("ab".getBytes("UTF-8"), 1L)), 1)
    assert(merges.head.leftId === 97 && merges.head.rightId === 98)
  }

  test("learn: overlapping pairs count per position and merge leftmost-first") {
    // "aaa": (a,a) counts twice; greedy application yields [aa, a]
    val merges = BpeTrainer.learn(Seq(("aaa".getBytes("UTF-8"), 1L)), 2)
    assert(merges(0).pairCount === 2L && merges(0).tokenHex === "6161")
    // round 1: remaining [256, 97] pairs once → token "aaa"
    assert(merges(1).pairCount === 1L && merges(1).tokenHex === "616161")
  }

  test("learn: exhausts gracefully when no pairs remain") {
    val merges = BpeTrainer.learn(Seq(("ab".getBytes("UTF-8"), 3L)), 10)
    assert(merges.length === 1) // after "ab" merges, every word is one token
  }

  test("pretoken histogram: Spark count equals a driver-side count") {
    val docs = Tables.t(spark, sf, "documents").limit(50).cache()
    val got = BpeTrainer.pretokenHistogram(spark, docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = docs.select("text").collect()
      .flatMap(r => Bpe.pretokens(r.getString(0)))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    assert(got === expected)
    docs.unpersist()
  }

  test("bpe_train: deterministic across runs; hex tokens decode to the pair concat") {
    val a = SparkEntry.queries("bpe_train")(spark, sf).collect()
    val b = SparkEntry.queries("bpe_train")(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 48)
    // token_hex of each merge = concat of its parts' byte strings
    val hexOf = scala.collection.mutable.Map[Long, String]()
    (0 until 256).foreach(i => hexOf(i.toLong) = f"$i%02x")
    a.sortBy(_.getLong(0)).foreach { r =>
      val (l, rt, id, hex) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5))
      assert(hex === hexOf(l) + hexOf(rt), s"merge $id")
      hexOf(id) = hex
    }
  }

  test("bpe_train_tokenize: learned-vocab tokenization == an independent driver encoder") {
    // learn the same table the key learns
    val d = Tables.t(spark, sf, "documents")
    val merges = BpeTrainer.train(spark, d, 256).orderBy("rank").collect()
      .map(r => (r.getLong(1).toInt, r.getLong(2).toInt))
    // INDEPENDENT reference encoder: repeated lowest-rank merge over a
    // Scala list, rank map keyed by the raw (left, right) tuple
    val rank = merges.zipWithIndex.toMap
    def encodeWord(word: Array[Byte]): List[Int] = {
      var ids = word.map(_ & 0xff).toList
      var done = false
      while (!done && ids.length >= 2) {
        val best = ids.zip(ids.tail).zipWithIndex
          .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
          .sortBy(_._1).headOption
        best match {
          case None => done = true
          case Some((r, i)) =>
            ids = ids.take(i) ::: (256 + r) :: ids.drop(i + 2)
        }
      }
      ids
    }
    val expected = d.orderBy("doc_id").limit(40).select("doc_id", "text").collect()
      .map { row =>
        val ids = Bpe.pretokens(row.getString(1))
          .flatMap(w => encodeWord(w.getBytes("UTF-8"))).toSeq
        val h = ids.foldLeft(0L)((acc, id) => (acc * 31 + id) % 1000000007L)
        row.getLong(0) -> ((ids.length.toLong, h))
      }.toMap
    val got = SparkEntry.queries("bpe_train_tokenize")(spark, sf)
      .limit(40).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)

    // the corpus-trained resource table was derived OFFLINE by
    // scripts/gen_bpe_vocab.py from this same sf0.001 corpus with the
    // same tie rules — so the distributed in-engine trainer must
    // REPRODUCE it bit-for-bit: merge list == the shipped resource
    // (training exhausts at the same point regardless of the larger
    // requested budget). The strongest trainer validation available:
    // two independent implementations, one answer. (Since r15 the
    // DEFAULT vocab behind text_tokens_bpe is the 8192-merge production
    // table, so the learned-vocab hashes are checked against a driver
    // encode with the SAME corpus-trained table instead of the key.)
    assert(merges.toSeq === Bpe.corpusTrainedMerges.toSeq,
      "in-engine training diverged from the offline derivation")
    val flat = merges.flatMap { case (l, r) => Array(l, r) }
    val table = Bpe.rankTable(flat)
    val frozen = d.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> Bpe.statsWith(table,
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))(1)
    }.toMap
    val learned = SparkEntry.queries("bpe_train_tokenize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(learned.forall { case (id, h, _) => frozen(id) == h })
    val meanCpt = learned.map(_._3).sum / learned.length
    assert(meanCpt > 1.3, s"no compression from the learned merges: $meanCpt")
  }

  test("word cap keeps the top-(count desc, word asc) prefix deterministically") {
    import spark.implicits._
    val docs = Seq("xx xx xx yy yy zz").toDF("text")
    // cap 3 on histogram {"xx"->3 hmm with leading-space pretokens}
    val hist = BpeTrainer.pretokenHistogram(spark, docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pretokens: "xx", " xx"×2, " yy"×2, "yy" is absorbed? no: "yy yy"
    // → " yy"×2; "zz" → " zz". Verify the scanner's own cover first:
    assert(hist === Map("xx" -> 1L, " xx" -> 2L, " yy" -> 2L, " zz" -> 1L))
    val capped = BpeTrainer.train(spark, docs, 1, maxWords = 2)
    // top-2 words are " xx" and " yy" (count 2 each, lex order): best pair
    // in round 0 is then (x,x) vs (y,y) at weight 2 with space-prefix
    // pairs at 2 too: ( ,x)=2, (x,x)=2, ( ,y)=2, (y,y)=2 → tie broken by
    // smallest pair = (' ','x') = (32, 120)
    val m = capped.collect().head
    assert((m.getLong(1), m.getLong(2)) === ((32L, 120L)))
  }
}
