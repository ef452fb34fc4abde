package graft.sources.lance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.StructType

/** Streaming *source* over a lance dataset: each micro-batch reads the
  * fragments added between two manifest versions (fragment tailing). The
  * offset is simply the manifest version — fragments are immutable and
  * append-only under append/streaming writes, so (startVersion,
  * endVersion] identifies an exact set of new fragments.
  *
  * Assumes an append-only dataset: an overwrite (truncate) replaces the
  * fragment list and the stream fails rather than silently re-reading
  * (same contract as file-stream sources over rewritten directories).
  */
case class LanceOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

class LanceMicroBatchStream(spark: SparkSession, root: String,
                            dataSchema: StructType, requiredSchema: StructType,
                            options: Map[String, String])
    extends MicroBatchStream {

  private def conf = Shim.hadoopConf(spark, options)

  private def parse(o: Offset): Long = o match {
    case LanceOffset(v) => v
    case other =>
      // offsets deserialize from the checkpoint log as JSON
      val s = other.json()
      """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(s"bad lance offset: $s"))
  }

  override def initialOffset(): Offset = LanceOffset(0L) // read from the beginning

  override def latestOffset(): Offset =
    LanceOffset(ManifestIO.latestVersion(root, conf).getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    LanceOffset("""\d+""".r.findFirstIn(json).map(_.toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad lance offset: $json")))

  /** Fragments present at `end` but not at `start` (by path — fragments
    * are immutable, so path identity is content identity). */
  private def newFragments(start: Long, end: Long): Seq[FragmentMeta] = {
    if (end <= start) return Seq.empty
    val c = conf
    val endFrags = ManifestIO.load(root, end, c).fragments
    if (start == 0) endFrags
    else {
      val startPaths = ManifestIO.load(root, start, c).fragments.map(_.path).toSet
      val dropped = startPaths -- endFrags.map(_.path).toSet
      if (dropped.nonEmpty) throw new IllegalStateException(
        s"lance stream: dataset was overwritten/compacted between versions $start and $end " +
          s"(missing fragments: ${dropped.take(3).mkString(", ")}…); streaming reads require append-only history")
      endFrags.filterNot(f => startPaths.contains(f.path))
    }
  }

  private val requiredNames = requiredSchema.fieldNames.toSet

  /** Every column map seen across planned batches. The reader factory must
    * cover exactly the fragments its partitions carry — an in-flight
    * catch-up batch can hold masked/renamed fragments that a later
    * compaction removed from the LATEST manifest, so deriving maps from
    * `loadLatest` either misses a group (IllegalStateException) or, when
    * the latest manifest is all-identity, reads a masked fragment through
    * the identity path and resurrects dropped-column values. Union-only
    * growth keeps concurrently-executing batches covered. */
  @volatile private var plannedColMaps: Set[LanceColumnMap] = Set.empty
  /** True once any planned fragment carried a delete vector (initial
    * catch-up of a dataset with deletes applies them; later DVs on
    * already-streamed fragments are never retro-applied — append-only). */
  @volatile private var plannedAnyDv: Boolean = false

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val frs = newFragments(parse(start), parse(end))
    val maps = frs.map(LanceColumnMap.of(_, requiredNames))
    synchronized {
      plannedColMaps ++= maps
      plannedAnyDv ||= frs.exists(_.deletes.isDefined)
    }
    frs.zip(maps).map { case (fr, cm) =>
      val p = new org.apache.hadoop.fs.Path(root, fr.path).toString
      val dv = fr.deletes.map(d => new org.apache.hadoop.fs.Path(root, d.path).toString)
      LanceInputPartition(p, 0, fr.sizeBytes, fr.sizeBytes, cm, dv): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // one reader group per column map the planned partitions actually carry
    // (fall back to the latest manifest only if planning hasn't run yet)
    val colMaps = {
      val planned = plannedColMaps.toSeq
      if (planned.nonEmpty) planned
      else ManifestIO.loadLatest(root, conf).toSeq
        .flatMap(_.fragments).map(LanceColumnMap.of(_, requiredNames)).distinct
    }
    if (colMaps.forall(_.isIdentity) && !plannedAnyDv) {
      val readFn = Shim.parquetReader(spark, dataSchema, requiredSchema, Seq.empty, options)
      new LanceReaderFactory(readFn, limit = None, columnar = false)
    } else {
      new LanceMaskedReaderFactory(
        LanceReadGroup.build(spark, dataSchema, requiredSchema, Seq.empty, options, colMaps),
        limit = None, Shim.serializableConf(conf))
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
