package graft.sources.lance

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import java.util.UUID

/** Commit-based write path (reference: LanceSink.java:122-188):
  * executors write immutable parquet fragments under `data/`, the driver
  * commit swaps in a new manifest — append keeps prior fragments, truncate
  * starts fresh. Streaming commits are made exactly-once by recording
  * (queryId, epochId) in the manifest and skipping replayed epochs.
  */
class LanceWriteBuilder(spark: SparkSession, root: String, info: LogicalWriteInfo,
                        extraOptions: Map[String, String]) extends WriteBuilder
    with SupportsOverwrite {

  private var truncateAll = false

  override def truncate(): WriteBuilder = { truncateAll = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) truncate()
    else throw new UnsupportedOperationException(
      "lance supports only full-overwrite (overwrite-by-filter is not implemented)")
  }

  override def build(): Write = {
    val opts = extraOptions ++
      scala.jdk.CollectionConverters.MapHasAsScala(info.options).asScala
    val schema = info.schema()
    // driver-side: Spark's parquet OutputWriterFactory + configured job conf
    val (factory, conf) = Shim.parquetWriterFactory(spark, schema, opts)
    val maxRows = LanceOptions.get(opts, "maxRowsPerFile").map(_.toLong).getOrElse(Long.MaxValue)
    new LanceWrite(root, schema, factory, conf, maxRows, truncateAll, info.queryId())
  }
}

case class LanceFragmentsCommitMessage(fragments: Seq[FragmentMeta]) extends WriterCommitMessage

class LanceWrite(root: String, schema: StructType,
                 factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
                 conf: SerializableConfiguration, maxRowsPerFile: Long,
                 truncateAll: Boolean, queryId: String) extends Write {

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new LanceDataWriterFactory(root, schema, factory, conf, maxRowsPerFile)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val newFrags = messages.flatMap {
        case m: LanceFragmentsCommitMessage => m.fragments
      }.toSeq
      val prev = ManifestIO.loadLatest(root, conf.value)
      // keep the DECLARED table schema, not the write query's schema — a
      // query schema can be narrower (non-nullable literals) and would
      // make columns "required" that old fragments don't even have
      val tableSchema = prev.map(_.schema).getOrElse(schema)
      val frags = if (truncateAll) newFrags
                  else prev.map(_.fragments).getOrElse(Seq.empty) ++ newFrags
      ManifestIO.commit(root, tableSchema, frags, conf.value)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      LanceWriteUtil.deleteFragments(root, messages, conf)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new LanceStreamingDataWriterFactory(root, schema, factory, conf, maxRowsPerFile)

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val latest = ManifestIO.loadLatest(root, conf.value)
      val alreadyCommitted = latest.exists(m =>
        m.txnAppId.contains(queryId) && m.txnEpoch.exists(_ >= epochId))
      if (alreadyCommitted) {
        // replayed epoch after recovery: fragments are duplicates — drop them
        LanceWriteUtil.deleteFragments(root, messages, conf)
      } else {
        val newFrags = messages.flatMap {
          case m: LanceFragmentsCommitMessage => m.fragments
        }.toSeq
        // as in batch commit: preserve the declared table schema on appends
        val tableSchema = latest.map(_.schema).getOrElse(schema)
        val prev = latest.map(_.fragments).getOrElse(Seq.empty)
        ManifestIO.commit(root, tableSchema, prev ++ newFrags, conf.value,
          txnAppId = Some(queryId), txnEpoch = Some(epochId))
      }
    }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      LanceWriteUtil.deleteFragments(root, messages, conf)
  }
}

object LanceWriteUtil {
  def deleteFragments(root: String, messages: Array[WriterCommitMessage],
                      conf: SerializableConfiguration): Unit = {
    val fs = ManifestIO.fs(root, conf.value)
    messages.foreach {
      case m: LanceFragmentsCommitMessage =>
        m.fragments.foreach(fr => fs.delete(new Path(root, fr.path), false))
      case _ => ()
    }
  }
}

class LanceDataWriterFactory(root: String, schema: StructType,
                             factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
                             conf: SerializableConfiguration, maxRowsPerFile: Long)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LanceDataWriter(root, schema, factory, conf, maxRowsPerFile, partitionId, taskId)
}

class LanceStreamingDataWriterFactory(root: String, schema: StructType,
                                      factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
                                      conf: SerializableConfiguration, maxRowsPerFile: Long)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new LanceDataWriter(root, schema, factory, conf, maxRowsPerFile, partitionId, taskId)
}

/** Executor-side fragment writer: rolls to a new parquet file every
  * `maxRowsPerFile` rows (reference: write.max-rows-per-file), then reads
  * each finished file's footer to build fragment stats for the manifest. */
class LanceDataWriter(root: String, schema: StructType,
                      factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
                      conf: SerializableConfiguration, maxRowsPerFile: Long,
                      partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val ctx = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-lance", 0), TaskType.MAP, partitionId), taskId.toInt)
    new TaskAttemptContextImpl(conf.value, attempt)
  }
  private val ext = factory.getFileExtension(ctx)
  private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
  private var rowsInFile = 0L
  private var files = List.empty[String] // relative paths under root

  private def roll(): Unit = {
    closeCurrent()
    val rel = s"${ManifestIO.DataDir}/${UUID.randomUUID()}-p$partitionId$ext"
    files ::= rel
    writer = factory.newInstance(new Path(root, rel).toString, schema, ctx)
    rowsInFile = 0L
  }

  private def closeCurrent(): Unit = {
    if (writer != null) { writer.close(); writer = null }
  }

  override def write(record: InternalRow): Unit = {
    if (writer == null || rowsInFile >= maxRowsPerFile) roll()
    writer.write(record)
    rowsInFile += 1
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    val frags = files.reverse.map { rel =>
      val (rows, size, stats) = ManifestIO.footerStats(conf.value, new Path(root, rel))
      FragmentMeta(rel, rows, size, stats)
    }
    LanceFragmentsCommitMessage(frags)
  }

  override def abort(): Unit = {
    closeCurrent()
    val fs = ManifestIO.fs(root, conf.value)
    files.foreach(rel => fs.delete(new Path(root, rel), false))
  }

  override def close(): Unit = closeCurrent()
}

/** Driver-side batch save for `df.write.format("lance").save(path)`:
  * stages through Spark's native (vectorized, codegen'd) parquet writer,
  * then moves the staged files in as fragments and commits one manifest.
  * At 100 TB this is the same IO as a plain parquet write plus an
  * O(files) footer pass and one rename per file. */
object LanceBatchSave {
  def write(spark: SparkSession, df: DataFrame, root: String,
            options: Map[String, String], append: Boolean): Unit = {
    val conf = Shim.hadoopConf(spark, options)
    val fs = ManifestIO.fs(root, conf)
    val prev = ManifestIO.loadLatest(root, conf)
    prev.foreach { m =>
      if (append) require(
        m.schema.fields.map(f => (f.name, f.dataType)).sameElements(
          df.schema.fields.map(f => (f.name, f.dataType))),
        s"lance append schema mismatch: table=${m.schema.simpleString} df=${df.schema.simpleString}")
    }
    val newFrags = stageFragments(spark, df, root,
      LanceOptions.get(options, "maxRowsPerFile"))
    val frags = if (append) prev.map(_.fragments).getOrElse(Seq.empty) ++ newFrags
                else newFrags
    ManifestIO.commit(root, df.schema, frags, conf)
  }

  /** Stage `df` through the native parquet writer, move the files in as
    * fragments under `data/`, and return their metadata (no commit). */
  private[lance] def stageFragments(spark: SparkSession, df: DataFrame, root: String,
                                    maxRowsPerFile: Option[String]): Seq[FragmentMeta] = {
    val conf = Shim.hadoopConf(spark, Map.empty)
    val fs = ManifestIO.fs(root, conf)
    val staging = new Path(root, s".staging-${UUID.randomUUID()}")
    try {
      var w = df.write.mode("overwrite")
      maxRowsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n))
      w.parquet(staging.toString)
      fs.mkdirs(new Path(root, ManifestIO.DataDir))
      fs.listStatus(staging).toSeq
        .filter(s => s.getPath.getName.endsWith(".parquet"))
        .map { st =>
          val rel = s"${ManifestIO.DataDir}/${UUID.randomUUID()}-${st.getPath.getName}"
          fs.rename(st.getPath, new Path(root, rel))
          val (rows, size, stats) = ManifestIO.footerStats(conf, new Path(root, rel))
          FragmentMeta(rel, rows, size, stats)
        }
    } finally {
      fs.delete(staging, true)
    }
  }
}

/** Dataset maintenance: compaction (merge small fragments) and vacuum
  * (drop old versions + unreferenced files). Both are ordinary manifest
  * commits — readers of existing versions are unaffected until vacuum
  * actually removes their files. */
object LanceMaintenance {
  /** Rewrite fragments smaller than `smallerThanRows` into consolidated
    * fragments of up to `targetRows` rows; commits one new version.
    * Returns the new manifest (or the current one if nothing to do). */
  def compact(spark: SparkSession, root: String,
              smallerThanRows: Long, targetRows: Long): LanceManifest = {
    val conf = Shim.hadoopConf(spark, Map.empty)
    val m = ManifestIO.loadLatest(root, conf).getOrElse(
      throw new IllegalStateException(s"lance dataset not found: $root"))
    val (small, big) = m.fragments.partition(_.rows < smallerThanRows)
    if (small.size <= 1) return m
    val paths = small.map(f => new Path(root, f.path).toString)
    val df = spark.read.schema(m.schema).parquet(paths: _*)
    val newFrags = LanceBatchSave.stageFragments(spark, df, root,
      Some(targetRows.toString))
    ManifestIO.commit(root, m.schema, big ++ newFrags, conf)
  }

  /** Keep only the last `retainVersions` manifests and delete data files no
    * remaining version references. Time travel older than the cutoff stops
    * working — that is the point. */
  def vacuum(spark: SparkSession, root: String, retainVersions: Int = 1): Unit = {
    require(retainVersions >= 1, "must retain at least the current version")
    val conf = Shim.hadoopConf(spark, Map.empty)
    val fs = ManifestIO.fs(root, conf)
    val versions = ManifestIO.listVersions(root, conf)
    val keep = versions.takeRight(retainVersions)
    val referenced = keep.flatMap(v =>
      ManifestIO.load(root, v, conf).fragments.map(_.path)).toSet
    val dataDir = new Path(root, ManifestIO.DataDir)
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).foreach { st =>
        val rel = s"${ManifestIO.DataDir}/${st.getPath.getName}"
        if (!referenced.contains(rel)) fs.delete(st.getPath, false)
      }
    }
    versions.dropRight(retainVersions).foreach(v =>
      fs.delete(ManifestIO.manifestFile(root, v), false))
  }
}
