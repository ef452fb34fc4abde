package graft.sources.lance

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.io.{DataInputStream, DataOutputStream}

/** Dense HyperLogLog sketch (p=11 → 2048 registers, ~2.3% standard error)
  * for approximate COUNT(DISTINCT) over columns the exact value
  * dictionaries cannot cover (reference capability: Lance datasets answer
  * count-distinct source-side; the exact path here declines once a
  * dictionary overflows — the sketch is the approximate fallback).
  *
  * Hashing is Spark's own XXH64 (seed fixed) so sketches are reproducible
  * across writers. Registers are bytes (max rank 64 fits). Standard HLL
  * estimator with linear-counting small-range correction; no large-range
  * correction needed with 64-bit hashes.
  */
final class Hll(val registers: Array[Byte]) extends Serializable {
  // every consumer (merge/estimate, the SQL-registered hll_merge /
  // hll_estimate included) indexes 0 until M — validate at the boundary so
  // arbitrary user binary fails with a diagnosis, not an AIOOBE mid-loop
  require(registers.length == Hll.M,
    s"not an HLL sketch: expected ${Hll.M} registers, got ${registers.length} bytes")
  def this() = this(new Array[Byte](Hll.M))

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - Hll.P)).toInt
    val rest = h << Hll.P
    // rank = leading zeros of the remaining bits + 1 (all-zero rest → 64-P+1)
    val rank = (if (rest == 0L) 64 - Hll.P else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def addLong(v: Long): Unit =
    addHash(org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, Hll.Seed))

  def addBytes(b: Array[Byte]): Unit =
    addHash(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, Hll.Seed))

  def addUTF8String(s: org.apache.spark.unsafe.types.UTF8String): Unit =
    addHash(org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, Hll.Seed))

  def merge(other: Hll): Hll = {
    val out = new Array[Byte](Hll.M)
    var i = 0
    while (i < Hll.M) {
      out(i) = math.max(registers(i), other.registers(i)).toByte
      i += 1
    }
    new Hll(out)
  }

  def estimate: Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < Hll.M) {
      invSum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val m = Hll.M.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val e = alpha * m * m / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) // linear counting
      else e
    math.round(corrected)
  }
}

/** Per-fragment bloom filter for equality pruning on columns whose exact
  * value dictionary overflowed (high-cardinality strings / integrals).
  * SIZED TO THE FRAGMENT: writers buffer each value's XXH64 (the same hash
  * the HLL consumes — one hash per value) and build the filter at file
  * close with ~10 bits per buffered key (~1% fpp), from 64K bits up to a
  * [[Bloom.MaxBits]] cap; fragments with more keys than
  * `write.bloom-max-keys` (default 1M) skip the bloom — an undersized
  * filter prunes nothing and only wastes sidecar bytes. 4 probes by
  * double hashing. Never wrong: a miss proves the value absent from the
  * fragment (pruning is sound), a hit proves nothing.
  */
final class Bloom(val words: Array[Long]) extends Serializable {
  private val bits: Long = words.length.toLong * 64L

  def addHash(h: Long): Unit = {
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < Bloom.K) {
      val bit = ((h + i * h2) & Long.MaxValue) % bits
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def mightContain(h: Long): Boolean = {
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < Bloom.K) {
      val bit = ((h + i * h2) & Long.MaxValue) % bits
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

object Bloom {
  val MinBits = 65536L
  val MaxBits = 16L * 1024 * 1024 // 2 MB of words — caps ~1.6M keys at 1% fpp
  val K = 4
  /** Default per-fragment key cap (write.bloom-max-keys). */
  val DefaultMaxKeys = 1000000L

  /** Build from buffered hashes, sized ~10 bits/key within [Min, Max]. */
  def build(hashes: Array[Long], n: Int): Bloom = {
    var bits = MinBits
    while (bits < 10L * n && bits < MaxBits) bits <<= 1
    val b = new Bloom(new Array[Long]((bits / 64).toInt))
    var i = 0
    while (i < n) { b.addHash(hashes(i)); i += 1 }
    b
  }

  def hashLong(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, Hll.Seed)
  def hashUTF8String(s: org.apache.spark.unsafe.types.UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, Hll.Seed)
}

object Hll {
  val P = 11
  val M: Int = 1 << P
  val Seed = 42L

  /** Per-fragment sketch sidecar: named column sketches in one small
    * immutable file under `_stats/` (manifests carry only its path, so
    * sketch storage never bloats the manifest JSON). */
  val Dir = "_stats"

  def writeSidecar(root: String, conf: Configuration,
                   sketches: Seq[(String, Hll, Option[Bloom])]): String = {
    val rel = s"$Dir/${java.util.UUID.randomUUID()}.hll"
    val fs = new Path(root).getFileSystem(conf)
    // serialize in memory and write ONCE: the sidecar lands at every
    // fragment close, and a DataOutputStream straight onto the (checksummed)
    // FS stream pays per-call overhead for each 8-byte bloom word — ~10ms
    // per fragment, the dominant write-side sketch tax. Hadoop create()
    // makes parent dirs, so no per-fragment mkdirs either.
    val bos = new java.io.ByteArrayOutputStream(4096)
    val out = new DataOutputStream(bos)
    out.writeInt(sketches.size)
    sketches.foreach { case (name, h, bloom) =>
      out.writeUTF(name)
      out.writeInt(h.registers.length)
      out.write(h.registers)
      bloom match {
        case Some(b) =>
          out.writeInt(b.words.length)
          b.words.foreach(out.writeLong)
        case None => out.writeInt(0)
      }
    }
    out.flush()
    ManifestIO.writeSmallFile(fs, new Path(root, rel), bos.toByteArray)
    rel
  }

  /** Approximate COUNT(DISTINCT) for `cols` over a lance dataset, answered
    * entirely from the per-fragment HLL sidecars: the sketch loads + merges
    * run DISTRIBUTED (one task per batch of fragments), the driver reduces
    * 2KB register arrays — zero data files read, O(fragments) tiny sidecar
    * reads however large the dataset. None for a column without a sketch
    * in every fragment (e.g. pre-sketch fragments, unsupported type).
    * Metadata-path deletes re-sketch a fragment's SURVIVING rows in the
    * same pass that writes its delete vector (LanceDelete), so estimates
    * track live rows; only delta-path (UPDATE/MERGE) DVs leave the sketch
    * over-approximating until compaction re-sketches clean fragments. */
  def approxCountDistinct(spark: org.apache.spark.sql.SparkSession, root: String,
                          cols: Seq[String],
                          options: Map[String, String] = Map.empty): Map[String, Option[Long]] = {
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, options)
    val m = ManifestIO.loadLatest(root, conf).getOrElse(
      throw new IllegalStateException(s"lance dataset not found: $root"))
    if (m.fragments.isEmpty) return cols.map(_ -> Some(0L)).toMap
    val refs = m.fragments.map(_.sketches)
    if (refs.exists(_.isEmpty)) return cols.map(_ -> None).toMap
    val ser = org.apache.spark.sql.graft.Shim.serializableConf(conf)
    val wanted = cols.toSet
    val merged: Map[String, Hll] = spark.sparkContext
      .parallelize(refs.flatten, math.max(1, math.min(refs.size, 64)))
      .map { rel =>
        readSidecar(root, ser.value, rel).collect {
          case (c, (h, _)) if wanted(c) => c -> h
        }.toMap
      }
      .reduce { (a, b) =>
        // a column must be sketched in EVERY fragment to answer
        (a.keySet intersect b.keySet).map(c => c -> a(c).merge(b(c))).toMap
      }
    cols.map(c => c -> merged.get(c).map(_.estimate)).toMap
  }

  def readSidecar(root: String, conf: Configuration,
                  rel: String): Map[String, (Hll, Option[Bloom])] = {
    val fs = new Path(root).getFileSystem(conf)
    val in = new DataInputStream(fs.open(new Path(root, rel)))
    try {
      val n = in.readInt()
      (0 until n).map { _ =>
        val name = in.readUTF()
        val len = in.readInt()
        require(len == M, s"sketch precision mismatch: $len registers")
        val regs = new Array[Byte](len)
        in.readFully(regs)
        val nWords = in.readInt()
        val bloom = if (nWords == 0) None
                    else Some(new Bloom(Array.fill(nWords)(in.readLong())))
        name -> (new Hll(regs), bloom)
      }.toMap
    } finally in.close()
  }
}

/** Process-wide cache of immutable sketch sidecars so fragment-prune
  * lookups (bloom equality checks) cost one small read per fragment EVER,
  * not per query. Bounded LRU; entries are (root, rel)-keyed and sidecars
  * never change, so there is no invalidation. */
object SidecarCache {
  private val MaxEntries = 4096
  private val cache = new java.util.LinkedHashMap[(String, String),
      Map[String, (Hll, Option[Bloom])]](64, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String), Map[String, (Hll, Option[Bloom])]]): Boolean =
      size() > MaxEntries
  }

  def get(root: String, conf: Configuration, rel: String): Map[String, (Hll, Option[Bloom])] = {
    val k = (root, rel)
    // fast path under the lock; the IO happens OUTSIDE it — a slow
    // object-store read must not serialize every other thread's cache
    // hits behind it (planning latency would become sum-of-loads)
    cache.synchronized {
      val hit = cache.get(k)
      if (hit != null) return hit
    }
    val loaded =
      try Some(Hll.readSidecar(root, conf, rel))
      catch {
        // TRANSIENT failure: log and do NOT cache — caching an empty map
        // would silently disable bloom pruning + NDV for this fragment
        // for the process lifetime after one throttled read
        case scala.util.control.NonFatal(_) => None
      }
    loaded match {
      case Some(m) =>
        cache.synchronized { cache.put(k, m) } // double-load is idempotent
        m
      case None =>
        logWarningOnce(root, rel)
        Map.empty
    }
  }

  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  private def logWarningOnce(root: String, rel: String): Unit =
    if (warned.add((root, rel)))
      System.err.println(
        s"[lance] sidecar read failed for $rel under $root — bloom pruning/NDV " +
          "disabled for this fragment THIS QUERY; will retry on next access")
}
