package graft.sources.lance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.Collections

/** Maintenance ops as SQL stored procedures (Spark 4 ProcedureCatalog —
  * the Iceberg `CALL cat.system.op(...)` surface):
  *
  * {{{
  *   CALL cat.system.compact(table => 'db.t', smaller_than_rows => 10000,
  *                           target_rows => 100000)
  *   CALL cat.system.vacuum(table => 'db.t', retain_versions => 3)
  *   CALL cat.system.history(table => 'db.t')
  * }}}
  *
  * Each returns its result as rows (compaction/vacuum summaries, the
  * version history table), driven by the same [[LanceMaintenance]]
  * entry points the Scala API uses.
  */
object LanceProcedures {

  val Namespace = "system"

  def load(catalog: LanceCatalog, ident: Identifier): UnboundProcedure = {
    if (!(ident.namespace.sameElements(Array(Namespace))))
      throw new IllegalArgumentException(
        s"lance: procedures live in the '$Namespace' namespace, got ${ident.namespace.mkString(".")}")
    ident.name match {
      case "compact" => compact(catalog)
      case "vacuum" => vacuum(catalog)
      case "history" => history(catalog)
      case "zorder" => zorder(catalog)
      case other => throw new IllegalArgumentException(
        s"lance: unknown procedure $other (expected compact / vacuum / history / zorder)")
    }
  }

  def list(): Array[Identifier] =
    Array("compact", "vacuum", "history", "zorder").map(Identifier.of(Array(Namespace), _))

  private def param(name: String, dt: DataType, default: Option[String] = None) = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One-result-set bound procedure. `run(tableRoot, args)` returns
    * (schema, rows of internal values). */
  private def bound(procName: String, catalog: LanceCatalog,
                    params: Array[ProcedureParameter])
                   (run: (String, InternalRow) => (StructType, Seq[Array[Any]])): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false // reads/commits manifests
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val table = input.getUTF8String(0).toString
          val root = catalog.tableRootFor(table)
          val (schema, resultRows) = run(root, input)
          // procedure output must be a LocalScan (driver-side rows)
          val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
            override def rows(): Array[InternalRow] =
              resultRows.map(vs => new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(vs): InternalRow).toArray
            override def readSchema(): StructType = schema
            override def description(): String = s"LanceProcedureResult($procName)"
          }
          Collections.singletonList(scan).iterator()
        }
      }
    }

  private def compact(catalog: LanceCatalog): UnboundProcedure =
    bound("compact", catalog, Array(
      param("table", StringType),
      param("smaller_than_rows", LongType, Some("10000")),
      param("target_rows", LongType, Some("1000000")))) { (root, in) =>
      val spark = SparkSession.active
      val before = ManifestIO.loadLatest(root,
        org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty))
        .map(_.fragments.size).getOrElse(0)
      val m = LanceMaintenance.compact(spark, root, in.getLong(1), in.getLong(2))
      (StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("fragments_before", IntegerType, nullable = false),
        StructField("fragments_after", IntegerType, nullable = false))),
        Seq(Array[Any](m.version, before, m.fragments.size)))
    }

  private def vacuum(catalog: LanceCatalog): UnboundProcedure =
    bound("vacuum", catalog, Array(
      param("table", StringType),
      param("retain_versions", IntegerType, Some("1")),
      param("grace_ms", LongType, Some((10 * 60 * 1000L).toString)))) { (root, in) =>
      val spark = SparkSession.active
      LanceMaintenance.vacuum(spark, root, in.getInt(1), in.getLong(2))
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val versions = ManifestIO.listVersions(root, conf)
      (StructType(Seq(
        StructField("retained_versions", IntegerType, nullable = false),
        StructField("earliest_version", LongType, nullable = false))),
        Seq(Array[Any](versions.size, versions.headOption.getOrElse(0L))))
    }

  private def zorder(catalog: LanceCatalog): UnboundProcedure =
    bound("zorder", catalog, Array(
      param("table", StringType),
      param("columns", StringType),
      param("target_rows", LongType, Some("1000000")))) { (root, in) =>
      val spark = SparkSession.active
      val cols = in.getUTF8String(1).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
      val m = LanceMaintenance.zorder(spark, root, cols, in.getLong(2))
      (StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_fragments", IntegerType, nullable = false))),
        Seq(Array[Any](m.version, m.fragments.size)))
    }

  private def history(catalog: LanceCatalog): UnboundProcedure =
    bound("history", catalog, Array(param("table", StringType))) { (root, _) =>
      val spark = SparkSession.active
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val fs = ManifestIO.fs(root, conf)
      val rows = ManifestIO.listVersions(root, conf).map { v =>
        val m = ManifestIO.load(root, v, conf)
        val mtime = fs.getFileStatus(ManifestIO.manifestFile(root, v)).getModificationTime
        Array[Any](v, mtime * 1000L, UTF8String.fromString(m.op),
          m.fragments.size, m.totalRows)
      }
      (StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("committed_at", TimestampType, nullable = false),
        StructField("op", StringType, nullable = false),
        StructField("n_fragments", IntegerType, nullable = false),
        StructField("n_rows", LongType, nullable = false))),
        rows)
    }
}
