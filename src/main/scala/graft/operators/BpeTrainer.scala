package graft.operators

import graft.functions.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Distributed BPE tokenizer TRAINING — the missing half of the frozen
  * `bpe_merges.txt` vocabulary (`scripts/gen_bpe_vocab.py` documents the
  * derivation this reproduces in-engine): learn the merge table from a
  * corpus instead of shipping it.
  *
  * Shape, which is also how production tokenizer trainers run at corpus
  * scale (GPT-2's and HuggingFace's trainers both operate on a pretoken
  * HISTOGRAM, never on raw text):
  *
  *  1. `pretokenHistogram` — the only O(corpus) stage: one map pass over
  *     `documents` (the same lossless byte-scanner pretokenizer the
  *     encoder uses, [[Bpe.pretokens]]) into ONE (word) shuffle with
  *     map-side partial counts. Output size is the DISTINCT-pretoken
  *     count — Zipf-bounded, ≪ corpus.
  *  2. a deterministic cap: top `maxWords` pretokens by
  *     (count DESC, word ASC) — a total order, so the kept set is
  *     reproducible bit-for-bit. At gate scale the cap never binds; at
  *     100 TB it bounds driver memory while keeping essentially all mass
  *     (the dropped tail is hapax-like by Zipf's law, and the trainer
  *     logs the dropped mass instead of hiding it).
  *  3. `learn` — exact sequential merge learning over the capped
  *     histogram on the driver: O(numMerges · Σ|word|) integer work,
  *     INDEPENDENT of corpus size. Selection is deterministic: highest
  *     pair count, ties broken by smallest (left, right) id pair.
  *
  * The gated key (`bpe_train`, rows-only — no SQL engine trains BPE) emits
  * the learned merge table; tokens surface as HEX because a merge may
  * legally join bytes that are not a whole UTF-8 char (byte-level BPE
  * merges inside multi-byte sequences).
  */
object BpeTrainer {

  /** One learned merge: rank r creates token `newId` = 256 + r. */
  case class Merge(rank: Int, leftId: Int, rightId: Int, newId: Int,
                   pairCount: Long, tokenHex: String)

  /** Adjacent-pair key (ids stay < 2^21 for any sane merge budget). */
  @inline private def pairKey(a: Int, b: Int): Long = (a.toLong << 21) | b.toLong

  /** Exact merge learning over a word histogram. Every adjacent position
    * counts (so "aaa" contributes (a,a) twice), matching the greedy
    * leftmost-first application below — the counting and the application
    * must agree or learned ranks drift from encoder behavior. */
  def learn(words: Seq[(Array[Byte], Long)], numMerges: Int): Seq[Merge] = {
    val cur: Array[Array[Int]] = words.map { case (b, _) => b.map(_ & 0xff) }.toArray
    val cnt: Array[Long] = words.map(_._2).toArray
    val vocabBytes = mutable.ArrayBuffer.empty[Array[Byte]] // ids >= 256
    def bytesOf(id: Int): Array[Byte] =
      if (id < 256) Array(id.toByte) else vocabBytes(id - 256)
    val out = mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      // count all adjacent pairs, weighted by word frequency
      val pc = new java.util.HashMap[java.lang.Long, Array[Long]]()
      var w = 0
      while (w < cur.length) {
        val ids = cur(w); val c = cnt(w)
        var i = 0
        while (i < ids.length - 1) {
          val k: java.lang.Long = pairKey(ids(i), ids(i + 1))
          val cell = pc.get(k)
          if (cell == null) pc.put(k, Array(c)) else cell(0) += c
          i += 1
        }
        w += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        // deterministic argmax: count DESC, then (left, right) ASC — the
        // packed key IS the (left, right) lexicographic order
        var bestKey = -1L; var bestCount = -1L
        val it = pc.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val k = e.getKey.longValue(); val c = e.getValue()(0)
          if (c > bestCount || (c == bestCount && k < bestKey)) {
            bestKey = k; bestCount = c
          }
        }
        val left = (bestKey >> 21).toInt; val right = (bestKey & ((1 << 21) - 1)).toInt
        val newId = 256 + r
        val tokenBytes = bytesOf(left) ++ bytesOf(right)
        vocabBytes += tokenBytes
        out += Merge(r, left, right, newId, bestCount,
          tokenBytes.map(b => f"${b & 0xff}%02x").mkString)
        // apply greedily leftmost-first in every word
        w = 0
        while (w < cur.length) {
          val ids = cur(w)
          if (ids.length >= 2) {
            var read = 0; var write = 0
            while (read < ids.length) {
              if (read < ids.length - 1 && pairKey(ids(read), ids(read + 1)) == bestKey) {
                ids(write) = newId; read += 2
              } else {
                ids(write) = ids(read); read += 1
              }
              write += 1
            }
            if (write < ids.length) cur(w) = java.util.Arrays.copyOf(ids, write)
          }
          w += 1
        }
        r += 1
      }
    }
    out.toSeq
  }

  /** The distributed pretoken histogram: one map + ONE (word) shuffle. */
  def pretokenHistogram(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("text")).as[String]
      .flatMap(t => Bpe.pretokens(t))
      .groupBy(col("value").as("word"))
      .agg(count(lit(1)).as("n"))
  }

  /** End-to-end training → the merge table as a DataFrame. */
  def train(s: SparkSession, docs: DataFrame, numMerges: Int,
            maxWords: Int = 1 << 17): DataFrame = {
    import s.implicits._
    val hist = pretokenHistogram(s, docs)
    // deterministic cap: a TOTAL order (count desc, word asc), so the
    // trained table is reproducible regardless of partitioning. Fetch
    // maxWords+1 rows in ONE job: the presence of the sentinel extra row
    // is the "cap bound" signal, so no second full histogram pass (and no
    // spurious message when distinct pretokens == maxWords exactly).
    val topPlus = hist.orderBy(col("n").desc, col("word").asc)
      .limit(maxWords + 1)
      .collect()
    val top = topPlus.take(maxWords)
      .map(row => (row.getString(0).getBytes("UTF-8"), row.getLong(1)))
      .toSeq
    // no silent caps: when the word cap binds, say so
    if (topPlus.length > maxWords)
      System.err.println(
        s"[bpe_train] word cap bound: training on the top $maxWords distinct pretokens; rest dropped")
    learn(top, numMerges)
      .map(m => (m.rank.toLong, m.leftId.toLong, m.rightId.toLong,
        m.newId.toLong, m.pairCount, m.tokenHex))
      .toDF("rank", "left_id", "right_id", "new_id", "pair_count", "token_hex")
  }
}
