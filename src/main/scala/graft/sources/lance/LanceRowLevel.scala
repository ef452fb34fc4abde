package graft.sources.lance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.sources.{And, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Group-based (copy-on-write) row-level operations — UPDATE / MERGE, and
  * the DELETE forms `SupportsDelete` declines (e.g. subquery predicates).
  * The "group" is the fragment: Spark reads every row of the affected
  * fragments through [[LanceCowScan]], computes the resulting rows, writes
  * them as new fragments, and the commit atomically swaps the scanned
  * fragments for the new ones.
  *
  * Pruning rule (critical): a fragment may be EXCLUDED from the scan only
  * if the operation provably leaves it untouched. For both UPDATE and the
  * group-based DELETE rewrite, Spark pushes (a conjunct-subset of) the
  * command's raw CONDITION — `RewriteDeleteFromTable.buildReplaceDataPlan`
  * hands the un-negated cond to `ReplaceData.condition`, and
  * `GroupBasedRowLevelOperationScanPlanning` splits/pushes that — so the
  * only safe prune is `provablyEmpty`: no row of the fragment can match
  * the pushed conjuncts ⇒ no row matches the full condition ⇒ untouched.
  * (`provablyAllMatch` is valid only in the `SupportsDelete` metadata
  * path, where the filters ARE the complete delete condition.) MERGE's
  * pushed filters come from join pushthrough and admit no such inference,
  * so MERGE never prunes.
  * Filters are never forwarded to the parquet reader (row-group skipping
  * inside a rewritten fragment would silently drop rows from the table).
  */

/** Manifest op names for row-level commands (change-feed metadata). */
object LanceRowLevelOps {
  def opName(cmd: RowLevelOperation.Command): String = cmd match {
    case RowLevelOperation.Command.DELETE => "delete"
    case RowLevelOperation.Command.UPDATE => "update"
    case RowLevelOperation.Command.MERGE => "merge"
    case other => other.toString.toLowerCase(java.util.Locale.ROOT)
  }
}

class LanceRowLevelOperation(root: String, extraOptions: Map[String, String],
                             cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** Fragments the scan planned (rel path -> DV rel path at scan time) —
    * exactly the set commit replaces. The DV identity is part of the
    * conflict check: a concurrent positional delete on a scanned fragment
    * would be silently dropped by the rewrite otherwise. */
  @volatile private[lance] var scanned: Map[String, Option[String]] = Map.empty

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    val conf = Shim.hadoopConf(spark, extraOptions)
    val m = ManifestIO.loadLatest(root, conf).getOrElse(
      throw new IllegalStateException(s"lance dataset not found: $root"))
    new LanceCowScanBuilder(spark, root, m,
      extraOptions ++ options.asScala.toMap, this)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LanceCowWriteBuilder(SparkSession.active, root, info, extraOptions, this)

  /** Request `_file` so Spark builds a metadata projection (which makes
    * ReplaceDataExec strip the __row_operation column for us) and can run
    * runtime group filtering over fragment identity. */
  override def requiredMetadataAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(LanceMetadata.FileCol))

  override def description(): String = s"LanceRowLevel($cmd, $root)"
}

class LanceCowScanBuilder(spark: SparkSession, root: String,
                          manifest: LanceManifest, options: Map[String, String],
                          op: LanceRowLevelOperation) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private var required: StructType = manifest.schema
  private var filters: Array[Filter] = Array.empty

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // all residual — used ONLY to skip provably-untouched fragments
  }
  override def pushedFilters(): Array[Filter] = filters
  override def pruneColumns(s: StructType): Unit = required = s

  override def build(): org.apache.spark.sql.connector.read.Scan = {
    import RowLevelOperation.Command
    val conj = filters.reduceOption(And(_, _))
    val affected = (op.command(), conj) match {
      case (Command.UPDATE | Command.DELETE, Some(c)) =>
        manifest.fragments.filterNot(fr =>
          LancePruning.provablyEmpty(fr, manifest.schema, c))
      case _ => manifest.fragments
    }
    op.scanned = affected.map(fr => fr.path -> fr.deletes.map(_.path)).toMap
    // a scan with NO reader-level filters and no limit: every row of every
    // affected fragment flows to the rewrite; runtime group filtering can
    // narrow the affected set (and op.scanned with it) before execution
    new LanceCowScan(spark, root, manifest, affected, required, options, op)
  }
}

/** The copy-on-write scan: a full-fragment scan that additionally supports
  * runtime group filtering over `_file` (the Iceberg pattern): Spark runs
  * the matching-rows subquery first, collects the distinct `_file` values
  * that contain matches, and pushes `IN(_file, …)` here — fragments with
  * no matching rows are then neither read nor rewritten, so a MERGE or
  * subquery-DML touching 1% of fragments rewrites 1% of the table. */
class LanceCowScan(spark: SparkSession, root: String, manifest: LanceManifest,
                   affected: Seq[FragmentMeta], required: StructType,
                   options: Map[String, String], op: LanceRowLevelOperation)
    extends LanceParquetScan(spark, root, manifest, affected, required,
      Seq.empty, None, options)
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(LanceMetadata.FileCol))

  override def filter(predicates: Array[Predicate]): Unit = {
    matchedFiles(predicates).foreach { keep =>
      val narrowed = fragments.filter(fr =>
        keep.contains(new org.apache.hadoop.fs.Path(root, fr.path).toString))
      fragments = narrowed
      op.scanned = narrowed.map(fr => fr.path -> fr.deletes.map(_.path)).toMap
    }
  }

  /** Extract the `IN (_file, literals…)` set; None = unrecognized shape
    * (keep everything — runtime filters are an optimization only). */
  private def matchedFiles(predicates: Array[Predicate]): Option[Set[String]] = {
    val sets = predicates.toSeq.flatMap { p =>
      if (p.name() != "IN" || p.children().isEmpty) None
      else {
        val onFile = p.children()(0) match {
          case r: NamedReference => r.fieldNames().sameElements(Array(LanceMetadata.FileCol))
          case _ => false
        }
        if (!onFile) None
        else {
          val vals: Seq[Option[String]] = p.children().drop(1).toSeq.map {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              Option(l.value()).map(_.toString)
            case _ => None
          }
          if (vals.exists(_.isEmpty)) None else Some(vals.flatten.toSet)
        }
      }
    }
    sets.reduceOption(_ intersect _)
  }
}

class LanceCowWriteBuilder(spark: SparkSession, root: String,
                           info: LogicalWriteInfo, extraOptions: Map[String, String],
                           op: LanceRowLevelOperation) extends WriteBuilder {
  override def build(): Write = {
    val opts = extraOptions ++ info.options.asScala
    val schema = info.schema()
    val (factory, conf) = Shim.parquetWriterFactory(spark, schema, opts)
    val maxRows = LanceOptions.any(opts, "maxRowsPerFile", "write.max-rows-per-file")
      .map(_.toLong).getOrElse(Long.MaxValue)
    // bucketed tables keep their SPJ layout through COW rewrites too:
    // the rewritten rows demux into per-bucket tagged fragment writers
    // (same seed-42 murmur3 fold as the write shuffle)
    val bucketSpec = LanceOptions.bucketSpecOf(opts, schema)
    new Write {
      override def toBatch: BatchWrite = new BatchWrite {
        override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DataWriterFactory =
          new LanceCowDataWriterFactory(root, schema, factory, conf, maxRows, bucketSpec)

        override def commit(messages: Array[WriterCommitMessage]): Unit = {
          val newFrags = messages.flatMap {
            case m: LanceFragmentsCommitMessage => m.fragments
          }.toSeq
          val touched = op.scanned
          val committed = ManifestIO.commit(root, conf.value) { latest =>
            val cur = latest.getOrElse(throw new IllegalStateException(
              s"lance dataset disappeared during ${op.command()}: $root"))
            // a concurrent rewrite removed a fragment we read (or layered a
            // new delete vector on it) — swapping would lose its changes,
            // duplicate rows, or resurrect concurrently-deleted positions
            val curBy = cur.fragments.map(f => f.path -> f).toMap
            val ok = touched.forall { case (p, dv) =>
              curBy.get(p).exists(_.deletes.map(_.path) == dv)
            }
            if (!ok) None
            else {
              val stamped = LanceWriteUtil.stampRacedDrops(newFrags, schema, cur.schema)
              Some(LanceCommit(cur.schema,
                cur.fragments.filterNot(f => touched.contains(f.path)) ++ stamped,
                cur.txns, LanceRowLevelOps.opName(op.command())))
            }
          }
          if (committed.isEmpty) {
            LanceWriteUtil.deleteFragments(root, messages, conf)
            throw new IllegalStateException(
              s"lance ${op.command()} lost a conflict with a concurrent rewrite at $root; retry")
          }
        }

        override def abort(messages: Array[WriterCommitMessage]): Unit =
          LanceWriteUtil.deleteFragments(root, messages, conf)
      }
    }
  }
}

/** Copy-on-write writer factory: UPDATE/MERGE rewrite plans prepend a
  * `__row_operation` int column that Spark only strips when the operation
  * declares metadata attributes (ReplaceDataExec picks the projecting
  * task solely on `metadataProjection`); plain group-based connectors
  * receive it raw. Detect the extra leading column from the first row's
  * arity and strip it with a ProjectingInternalRow; every row reaching a
  * group-based ReplaceData is a write (deletes are filtered out of the
  * query), so the operation value itself needs no dispatch. */
class LanceCowDataWriterFactory(root: String, schema: StructType,
                                factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
                                conf: org.apache.spark.util.SerializableConfiguration,
                                maxRowsPerFile: Long,
                                bucketSpec: Option[(Int, org.apache.spark.sql.types.DataType, Int)] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long):
      DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    def mk(pid: Int, bucketed: Boolean) = new LanceDataWriter(root, schema,
      factory, conf, maxRowsPerFile, pid, taskId, bucketed = bucketed)
    new DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      private var checked = false
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
      private lazy val plain = mk(partitionId, bucketed = false)
      private var plainUsed = false
      private val bucketWriters =
        scala.collection.mutable.HashMap.empty[Int, LanceDataWriter]
      private def route(r: org.apache.spark.sql.catalyst.InternalRow): LanceDataWriter =
        bucketSpec match {
          case Some((idx, dt, n)) =>
            val h = org.apache.spark.sql.graft.Shim
              .murmur3Hash(r.get(idx, dt), dt, 42L).toInt
            val b = ((h % n) + n) % n
            bucketWriters.get(b) match {
              case Some(w) => w
              case None if bucketWriters.size < LanceDeltaWriter.DemuxMaxOpen =>
                bucketWriters.getOrElseUpdate(b, mk(b, bucketed = true))
              case None => plainUsed = true; plain // open-writer cap: untagged overflow
            }
          case None => plainUsed = true; plain
        }
      private def all: Seq[LanceDataWriter] =
        (if (plainUsed) Seq(plain) else Seq.empty) ++ bucketWriters.values.toSeq
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        if (!checked) {
          checked = true
          if (row.numFields == schema.length + 1)
            proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
              schema, 1 to schema.length)
        }
        if (proj == null) route(row).write(row)
        else { proj.project(row); route(proj).write(proj) }
      }
      override def commit(): WriterCommitMessage =
        LanceFragmentsCommitMessage(all.flatMap(_.commit() match {
          case m: LanceFragmentsCommitMessage => m.fragments
        }))
      override def abort(): Unit = all.foreach(_.abort())
      override def close(): Unit = all.foreach(_.close())
    }
  }
}
