package graft.sources.lance

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** The `db.t$files` metadata table: one row per live fragment of the
  * latest manifest — path, physical/live rows, bytes, bucket tag,
  * delete-vector state, sketch sidecar, hidden-column count. Metadata is
  * manifest-sized (thousands of rows for a 100 TB table), so it reads as
  * a driver-local scan with zero data-file IO — the Delta/Iceberg
  * files-table idiom for layout introspection.
  */
class LanceFilesTable(root: String, conf: Configuration, tableName: String)
    extends Table with SupportsRead {

  private val schemaDef = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("live_rows", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = true),
    StructField("dv_count", LongType, nullable = true),
    StructField("sketches", StringType, nullable = true),
    StructField("n_hidden", IntegerType, nullable = false)))

  override def name(): String = tableName
  override def schema(): StructType = schemaDef
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LocalScan {
      override def readSchema(): StructType = schemaDef
      override def description(): String = s"LanceFilesTable($root)"
      override def rows(): Array[InternalRow] = {
        val m = ManifestIO.loadLatest(root, conf).getOrElse(
          throw new IllegalStateException(s"lance dataset not found: $root"))
        m.fragments.map { fr =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(fr.path),
            fr.rows,
            fr.liveRows,
            fr.sizeBytes,
            fr.bucket.map(Integer.valueOf).orNull,
            fr.deletes.map(d => java.lang.Long.valueOf(d.count)).orNull,
            fr.sketches.map(UTF8String.fromString).orNull,
            fr.hidden.size)): InternalRow
        }.toArray
      }
    }
}
