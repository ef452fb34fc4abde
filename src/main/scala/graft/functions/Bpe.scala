package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-level BPE with a FIXED vocabulary shipped as a
  * resource (`/graft/bpe_merges.txt`, derivation documented in
  * scripts/gen_bpe_vocab.py) — the real subword tokenizer behind
  * `text_tokens_bpe`: corpus token budgets, packing and chunking are
  * defined in BPE/unigram subword tokens in production recipes, and
  * whitespace counts skew them 1.3-1.7× with language-dependent bias.
  *
  * Algorithm (GPT-2 byte-level BPE, merges over raw bytes):
  *  1. pretokenize with the leftmost-first pattern
  *     {{{ " ?[a-zA-Z]+ | ?[0-9]+ | ?[^\sa-zA-Z0-9]+ | \s+" }}}
  *     realized as a byte scanner (every input byte lands in exactly one
  *     pretoken, so tokenization is LOSSLESS — decode ∘ encode = id);
  *  2. per pretoken: start from the byte-value token ids (0..255) and
  *     repeatedly merge the adjacent pair with the lowest merge rank;
  *     merge r produces token id 256+r whose byte string is the
  *     concatenation of its parts.
  *
  * Everything is integer arithmetic over a frozen table — bit-identical
  * across JVMs, partitions and rounds, which is what lets the gated key
  * pin the tokenization with a polynomial id-hash column.
  */
object Bpe {
  private def loadMerges(res: String): Array[(Int, Int)] = {
    val in = getClass.getResourceAsStream(res)
    require(in != null, s"resource $res missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val p = l.trim.split(' ')
      (p(0).toInt, p(1).toInt)
    }.toArray
    finally src.close()
  }

  /** (left, right) token-id pairs in rank order; merge r defines id 256+r.
    * The production-posture vocabulary (8192 merges — r15): the corpus-
    * statistics-driven expansion documented in scripts/gen_bpe_vocab.py
    * (--expand), sized like a real subword tokenizer so the `_bpe` keys
    * exercise realistic rank-table depth and merge counts. */
  private val merges: Array[(Int, Int)] = loadMerges("/graft/bpe_merges_8k.txt")

  /** The small CORPUS-TRAINED table (saturates at 127 merges on the
    * synthetic corpus — 61 distinct pretokens at sf0.1): kept as the
    * bit-for-bit reproduction target for the distributed trainer
    * (BpeTrainSpec) — two independent implementations, one answer. */
  val corpusTrainedMerges: Array[(Int, Int)] = loadMerges("/graft/bpe_merges.txt")

  // ids stay < 2^21 (256 + |merges|), so a pair packs into one long key
  @inline private def pairKey(a: Int, b: Int): Long = (a.toLong << 21) | b.toLong

  private val ranks: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](merges.length * 2)
    var r = 0
    while (r < merges.length) {
      m.put(pairKey(merges(r)._1, merges(r)._2), r)
      r += 1
    }
    m
  }

  /** Token id → byte string (0..255 are the raw bytes) — the decode table
    * that proves losslessness. */
  val vocab: Array[Array[Byte]] = {
    val v = new Array[Array[Byte]](256 + merges.length)
    var i = 0
    while (i < 256) { v(i) = Array(i.toByte); i += 1 }
    var r = 0
    while (r < merges.length) {
      v(256 + r) = v(merges(r)._1) ++ v(merges(r)._2)
      r += 1
    }
    v
  }

  def vocabSize: Int = vocab.length

  // regex \s byte classes (the corpus is UTF-8; non-ASCII bytes class as
  // "other", which only ever groups them with adjacent non-ASCII bytes —
  // still lossless)
  @inline private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'
  @inline private def isLetter(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Int): Boolean = c >= '0' && c <= '9'
  @inline private def cls(c: Int): Int =
    if (isLetter(c)) 0 else if (isDigit(c)) 1 else 2 // 2 = other non-ws

  /** End (exclusive) of the pretoken starting at `start` — the scanner
    * form of the leftmost-first alternation above: a single ' ' directly
    * before a non-ws byte attaches to that run (GPT-2's " ?"); any other
    * whitespace starts a maximal `\s+` run. */
  private[graft] def tokenEnd(b: Array[Byte], start: Int): Int = {
    val n = b.length
    var j = start
    var c = b(j) & 0xff
    if (c == ' ' && j + 1 < n && !isWs(b(j + 1) & 0xff)) { j += 1; c = b(j) & 0xff }
    if (isWs(c)) {
      while (j < n && isWs(b(j) & 0xff)) j += 1
      j
    } else {
      val k = cls(c)
      while (j < n && !isWs(b(j) & 0xff) && cls(b(j) & 0xff) == k) j += 1
      j
    }
  }

  /** The pretoken cover of `text` (lossless: concatenation restores the
    * input). Slices always align to UTF-8 char boundaries — a multi-byte
    * char's bytes are all class-"other" non-ws bytes, so one char never
    * splits across pretokens. Used by the distributed trainer
    * ([[graft.operators.BpeTrainer]]). */
  def pretokens(text: String): Iterator[String] = {
    val b = text.getBytes("UTF-8")
    new Iterator[String] {
      private var i = 0
      def hasNext: Boolean = i < b.length
      def next(): String = {
        val e = tokenEnd(b, i)
        val w = new String(b, i, e - i, "UTF-8")
        i = e
        w
      }
    }
  }

  /** Greedy BPE of one pretoken `bytes[from, until)` → token ids. */
  private def encodeWord(bytes: Array[Byte], from: Int, until: Int): Array[Int] =
    encodeWordWith(ranks, bytes, from, until)

  /** The same greedy merge loop against an ARBITRARY rank table — the seam
    * that lets a LEARNED merge table (BpeTrainer's output) drive encoding
    * exactly like the frozen resource vocabulary does. */
  private[functions] def encodeWordWith(
      rk: java.util.HashMap[java.lang.Long, java.lang.Integer],
      bytes: Array[Byte], from: Int, until: Int): Array[Int] = {
    var len = until - from
    val ids = new Array[Int](len)
    var i = 0
    while (i < len) { ids(i) = bytes(from + i) & 0xff; i += 1 }
    var merged = true
    while (merged && len >= 2) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < len - 1) {
        val r = rk.get(pairKey(ids(j), ids(j + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestPos = j }
        j += 1
      }
      if (bestPos < 0) merged = false
      else {
        ids(bestPos) = 256 + bestRank
        var k = bestPos + 1
        while (k < len - 1) { ids(k) = ids(k + 1); k += 1 }
        len -= 1
      }
    }
    java.util.Arrays.copyOf(ids, len)
  }

  /** Build a rank table from (left, right) merge pairs in rank order. */
  def rankTable(pairs: Array[Int]): java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    require(pairs.length % 2 == 0, "flattened (left, right) pairs expected")
    val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](pairs.length)
    var r = 0
    while (r * 2 < pairs.length) {
      m.put(pairKey(pairs(r * 2), pairs(r * 2 + 1)), r)
      r += 1
    }
    m
  }

  /** [[stats]] against an arbitrary rank table (static: shared by
    * interpreted eval and generated code). */
  def statsWith(rk: java.util.HashMap[java.lang.Long, java.lang.Integer],
                s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    var count = 0L
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val end = tokenEnd(bytes, i)
      val ids = encodeWordWith(rk, bytes, i, end)
      var k = 0
      while (k < ids.length) { h = (h * 31 + ids(k)) % Mod; k += 1 }
      count += ids.length
      i = end
    }
    Array(count, h)
  }

  private[functions] final val Mod = 1000000007L

  /** (token count, polynomial hash of the id sequence) for a document —
    * the hash pins the exact tokenization (not just its length) through
    * the rows-only gate. Called from both eval and generated code. */
  def stats(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    var count = 0L
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val end = tokenEnd(bytes, i)
      val ids = encodeWord(bytes, i, end)
      var k = 0
      while (k < ids.length) { h = (h * 31 + ids(k)) % Mod; k += 1 }
      count += ids.length
      i = end
    }
    Array(count, h)
  }

  /** Per-chunk stats for BPE-token-window chunking: window w covers tokens
    * [w*stride, w*stride + chunkTokens) of the document's token stream
    * (pretokens concatenated in order — the same stream [[stats]] counts),
    * last chunk truncated. Returns one [n_tokens, n_bytes, id_poly_hash]
    * triple per chunk: n_bytes is the summed byte length of the chunk's
    * tokens (chunks tile the document when stride == chunkTokens, overlap
    * when stride < chunkTokens), the hash pins the chunk's exact token
    * ids. Single pass, O(doc) memory — stays a pure map stage. */
  def chunkStats(s: UTF8String, chunkTokens: Int, stride: Int): Array[Array[Long]] = {
    val ids = encodeBytes(s.getBytes)
    val n = ids.length
    if (n == 0) return Array.empty
    val nChunks = if (n <= chunkTokens) 1 else (n - chunkTokens + stride - 1) / stride + 1
    val out = new Array[Array[Long]](nChunks)
    var w = 0
    while (w < nChunks) {
      val from = w * stride
      val until = math.min(from + chunkTokens, n)
      var bytes = 0L
      var h = 0L
      var k = from
      while (k < until) {
        bytes += vocab(ids(k)).length
        h = (h * 31 + ids(k)) % Mod
        k += 1
      }
      out(w) = Array((until - from).toLong, bytes, h)
      w += 1
    }
    out
  }

  private def encodeBytes(bytes: Array[Byte]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < bytes.length) {
      val end = tokenEnd(bytes, i)
      out ++= encodeWord(bytes, i, end)
      i = end
    }
    out.toArray
  }

  /** Full-document encode (spec helper — the gated path uses [[stats]]). */
  def encode(text: String): Array[Int] = encodeBytes(text.getBytes("UTF-8"))

  /** Inverse of [[encode]] — byte-exact by construction. */
  def decode(ids: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ids.foreach(id => out.write(vocab(id)))
    out.toByteArray
  }
}

/** `bpe_stats(text)` → array<bigint> [token_count, id_poly_hash]: the
  * codegen'd expression form of [[Bpe.stats]] — one static call on the
  * hot path, so it stays inside whole-stage codegen and the operator is a
  * pure map stage at any scale.
  */
case class BpeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"bpe_stats needs string, got $dt")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Bpe.stats(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Bpe.stats($s));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_chunks(text, chunkTokens, stride)` → array<array<bigint>>: one
  * [n_tokens, n_bytes, id_poly_hash] triple per BPE-token window (see
  * [[Bpe.chunkStats]]) — the subword-token form of overlapping-window
  * chunking. Codegen'd single static call; a doc's chunk list never
  * leaves its task, so chunking over real tokenizer windows is still one
  * map stage at any corpus size. */
case class BpeChunks(child: Expression, chunkTokens: Int, stride: Int)
    extends UnaryExpression {
  require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
    s"need 0 < stride <= chunkTokens, got ($chunkTokens, $stride)")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"bpe_chunks needs string, got $dt")
  }

  override def nullSafeEval(v: Any): Any =
    BpeChunks.toArrayData(
      Bpe.chunkStats(v.asInstanceOf[UTF8String], chunkTokens, stride))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.BpeChunks.toArrayData(
         |  graft.functions.Bpe.chunkStats($s, $chunkTokens, $stride));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeChunks {
  /** Shared by interpreted eval + generated code. */
  def toArrayData(chunks: Array[Array[Long]]): GenericArrayData =
    new GenericArrayData(chunks.map(c => new GenericArrayData(c): Any))
}

/** `bpe_stats_with(text, merges)` — [[BpeStats]] over a RUNTIME merge
  * table: the train→encode loop closed. The learned (left, right) pairs
  * (flattened, rank order — BpeTrainer's output) build the rank table
  * once per executor and ride the plan as a reference object; the
  * tokenize pass is the same codegen'd single static call as the frozen
  * vocabulary's. */
case class BpeStatsWith(child: Expression, pairs: IndexedSeq[Int])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"bpe_stats_with needs string, got $dt")
  }

  // pairs is an immutable IndexedSeq (not Array) so case-class equality
  // is value-based and semanticEquals / subexpression elimination can
  // recognize two identical bpe_stats_with expressions in one plan
  @transient private lazy val table = Bpe.rankTable(pairs.toArray)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Bpe.statsWith(table, v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", table,
      "java.util.HashMap<Long, Integer>")
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Bpe.statsWith($ref, $s));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
