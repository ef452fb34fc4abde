package graft.sources.lance

import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** `format("lance")` entry point — a Spark-native dataset source with the
  * capabilities of the reference connector (fragment-parallel batch read
  * with projection/filter/limit/aggregate pushdown, append/overwrite
  * commit-based write, manifest versioning / time travel, streaming sink).
  *
  * Reference surface being re-expressed: LanceSource.java (fragment
  * splits), LanceSink.java (append/overwrite, max-rows-per-file),
  * LanceDynamicTableSource.java:61-63 (the four pushdown mix-ins).
  *
  * Writes to a *new* path go through the V1 `CreatableRelationProvider`
  * fallback (Spark only routes `df.write.save(path)` to a V2 table that
  * already has a schema); existing datasets take the V2 BatchWrite path.
  * Both end in the same manifest commit.
  */
/** Option lookup that tolerates the key-lowercasing of
  * `CaseInsensitiveStringMap` (V2 reader/writer options arrive lowercased). */
object LanceOptions {
  def get(m: Map[String, String], key: String): Option[String] =
    m.get(key).orElse(m.get(key.toLowerCase(java.util.Locale.ROOT)))

  /** First present key wins — for reference-name aliases (the reference's
    * write.max-rows-per-file ≡ this connector's original maxRowsPerFile). */
  def any(m: Map[String, String], keys: String*): Option[String] =
    keys.view.flatMap(get(m, _)).headOption

  private def isBucketKey(k: String): Boolean = {
    val n = k.toLowerCase(java.util.Locale.ROOT)
    n == "write.bucket-by" || n == "bucketby" ||
      n == "write.bucket-count" || n == "bucketcount"
  }

  /** The declared bucket layout as (key field index, key type, bucket
    * count) against `schema` — what a row-level writer needs to demux
    * re-inserted rows into correctly-tagged per-bucket fragments. The
    * layout is SINGLE-column by construction (LanceWrite rejects
    * multi-column write.bucket-by at write time — Spark's SPJ planner
    * doesn't match multi-argument bucket transforms); a comma here means
    * a manifest this writer never produced, so fail loudly rather than
    * silently skipping the demux and stranding the SPJ layout on the
    * first UPDATE/MERGE. */
  def bucketSpecOf(opts: Map[String, String],
                   schema: org.apache.spark.sql.types.StructType):
      Option[(Int, org.apache.spark.sql.types.DataType, Int)] = for {
    cs <- any(opts, "write.bucket-by", "bucketBy")
    nS <- any(opts, "write.bucket-count", "bucketCount")
    c = cs.trim
    _ = require(!c.contains(','),
      s"lance: write.bucket-by declares multiple columns ($c) — this layout " +
        "is single-column only and such a manifest should not exist")
    if schema.fieldNames.contains(c)
  } yield (schema.fieldIndex(c), schema(c).dataType, nS.toInt)

  /** Merge per-write/per-read overrides over table properties — EXCEPT the
    * bucket layout: once the table declares write.bucket-by/-count, an
    * override would tag new fragments under a different layout than the
    * one scans report through KeyGroupedPartitioning, silently corrupting
    * storage-partitioned joins. The persisted layout always wins. */
  def mergeWriteOptions(props: Map[String, String],
                        overrides: Map[String, String]): Map[String, String] =
    if (any(props, "write.bucket-by", "bucketBy").isEmpty) props ++ overrides
    else props ++ overrides.filterNot { case (k, _) => isBucketKey(k) }
}

class LanceDataSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider {

  override def shortName(): String = "lance"

  private def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("lance: 'path' option required"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = rootOf(options)
    val conf = Shim.hadoopConf(SparkSession.active, options.asScala.toMap)
    ManifestIO.loadLatest(root, conf).map(_.schema).getOrElse(new StructType())
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new LanceTable(rootOf(options), options.asScala.toMap)
  }

  /** V1 path-write fallback: handles dataset creation (plus append/
    * overwrite) for `df.write.format("lance").save(path)`. Stages through
    * Spark's native parquet writer, then commits fragments + manifest. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: Dataset[Row]): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("lance: 'path' required"))
    val spark = sqlContext.sparkSession
    val conf = Shim.hadoopConf(spark, parameters)
    val exists = ManifestIO.exists(root, conf)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"lance dataset already exists: $root")
      case SaveMode.Ignore if exists => ()
      case m =>
        LanceBatchSave.write(spark, data.toDF(), root, parameters,
          append = m == SaveMode.Append && exists)
    }
    val resultSchema = ManifestIO.loadLatest(root, conf).map(_.schema)
      .getOrElse(data.schema)
    new BaseRelation {
      override def sqlContext: SQLContext = spark.sqlContext
      override def schema: StructType = resultSchema
    }
  }
}

/** The dataset as a DSv2 table. `viaCatalog` tables always expose write
  * capabilities; bare-path tables only do once the dataset exists (so path
  * writes to a fresh location fall back to the creating V1 path). */
class LanceTable(val root: String, extraOptions: Map[String, String],
                 viaCatalog: Boolean = false,
                 providedName: Option[String] = None) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  private def spark = SparkSession.active
  private def conf = Shim.hadoopConf(spark, extraOptions)

  /** Manifest pinned at table resolution: versionAsOf / timestampAsOf
    * option, else latest. */
  lazy val manifest: Option[LanceManifest] = {
    val c = conf
    (LanceOptions.get(extraOptions, "versionAsOf"),
      LanceOptions.get(extraOptions, "timestampAsOf")) match {
      case (Some(v), _) => Some(ManifestIO.load(root, v.toLong, c))
      case (None, Some(ts)) =>
        val millis = LanceTable.parseTimestampMillis(ts)
        val v = ManifestIO.versionAsOfTimestamp(root, c, millis).getOrElse(
          throw new IllegalArgumentException(
            s"lance: no version committed at or before timestampAsOf=$ts at $root"))
        Some(ManifestIO.load(root, v, c))
      case _ => ManifestIO.loadLatest(root, c)
    }
  }

  override def name(): String = providedName.getOrElse(s"lance.`$root`")

  /** Manifest-persisted TBLPROPERTIES (SHOW TBLPROPERTIES reads these). */
  override def properties(): util.Map[String, String] =
    manifest.map(_.props).getOrElse(Map.empty).asJava

  /** A bucketed layout reports its bucket(N, col) transform (DESCRIBE
    * shows it; writes still enforce it via RequiresDistributionAndOrdering
    * from the same persisted properties). */
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] = {
    val props = manifest.map(_.props).getOrElse(Map.empty)
    (LanceOptions.any(props, "write.bucket-by", "bucketBy"),
      LanceOptions.any(props, "write.bucket-count", "bucketCount")) match {
      case (Some(c), Some(n)) =>
        Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
          n.toInt, c.split(',').map(_.trim).filter(_.nonEmpty): _*))
      case _ => Array.empty
    }
  }

  /** Table properties act as write defaults; explicit reader/writer options
    * override them — EXCEPT the bucket layout: once the table declares
    * write.bucket-by/-count, a per-write override would tag new fragments
    * under a different layout than the one scans report through
    * KeyGroupedPartitioning, silently corrupting storage-partitioned
    * joins. The persisted layout always wins. */
  private def tableOptions: Map[String, String] =
    LanceOptions.mergeWriteOptions(
      manifest.map(_.props).getOrElse(Map.empty), extraOptions)

  /** read.change-feed=true surfaces `_change_type` as a declared column —
    * batch scans label every row "insert"; the streaming source emits
    * "insert"/"delete" change rows per commit (CDC). Declared (not a
    * metadata column) so streaming relations resolve it too. */
  private def changeFeed: Boolean =
    LanceOptions.any(extraOptions, "readChangeFeed", "read.change-feed")
      .exists(_.toBoolean)

  override def schema(): StructType = {
    val base = manifest.map(_.schema).getOrElse(new StructType())
    if (changeFeed && !base.fieldNames.contains(LanceMetadata.ChangeCol))
      base.add(LanceMetadata.ChangeCol, org.apache.spark.sql.types.StringType,
        nullable = false)
    else base
  }

  override def capabilities(): util.Set[TableCapability] = {
    val caps = new util.HashSet[TableCapability]()
    caps.add(TableCapability.BATCH_READ)
    caps.add(TableCapability.MICRO_BATCH_READ)
    caps.add(TableCapability.STREAMING_WRITE)
    // Bare-path tables deliberately do NOT claim BATCH_WRITE: path saves
    // then route to the V1 staging writer (LanceBatchSave), which supports
    // dataset creation and overwrite-with-new-schema. Catalog tables take
    // the V2 BatchWrite path (INSERT INTO / CTAS).
    if (viaCatalog) {
      caps.add(TableCapability.BATCH_WRITE)
      caps.add(TableCapability.TRUNCATE)
      caps.add(TableCapability.OVERWRITE_BY_FILTER)
    }
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val m = manifest.getOrElse(
      throw new IllegalStateException(s"lance dataset not found: $root"))
    new LanceScanBuilder(spark, root, m, extraOptions ++ options.asScala.toMap)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LanceWriteBuilder(spark, root, info, tableOptions)

  // DELETE FROM: decline predicates we can't faithfully rebuild as Columns
  // (Spark then reports unsupported instead of us running a wrong rewrite)
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => LanceDelete.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    LanceDelete.deleteWhere(spark, root, filters, extraOptions)

  // `_file`/`_pos`/`_change_type` metadata columns: fragment/row identity
  // for users and for row-level runtime group filtering (names already
  // declared in the schema — e.g. _change_type under read.change-feed —
  // are excluded to avoid a duplicate-column conflict)
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = {
    val declared = schema().fieldNames.toSet
    LanceMetadata.columns.filterNot(c => declared(c.name()))
  }

  // UPDATE / MERGE (and subquery DELETEs): delta (merge-on-read, positional
  // delete vectors — LanceDeltaRowLevelOperation) by default; copy-on-write
  // fragment rewrites (LanceRowLevelOperation) when mode = "cow". Mode
  // resolves table option > session conf, read per command so tests and
  // sessions can switch without re-resolving the table.
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo):
      org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => {
      val mode = LanceOptions.any(tableOptions, "rowLevelMode", "write.row-level-mode")
        .orElse(spark.conf.getOption("spark.graft.lance.row-level-mode"))
        .getOrElse("delta")
      mode match {
        case "cow" => new LanceRowLevelOperation(root, tableOptions, info.command())
        // tableOptions (manifest props included) so the delta writer sees
        // the declared bucket layout and keeps tagging re-inserted rows
        case "delta" => new LanceDeltaRowLevelOperation(root, tableOptions, info.command())
        case other => throw new IllegalArgumentException(
          s"lance: unknown row-level mode '$other' (expected 'delta' or 'cow')")
      }
    }
}

object LanceTable {
  /** timestampAsOf accepts epoch millis, `java.sql.Timestamp` syntax
    * ("yyyy-mm-dd hh:mm:ss[.f]", session-local), or ISO-8601 instants. */
  def parseTimestampMillis(s: String): Long = {
    val trimmed = s.trim
    if (trimmed.matches("-?\\d+")) trimmed.toLong
    else scala.util.Try(java.sql.Timestamp.valueOf(trimmed).getTime)
      .getOrElse(java.time.Instant.parse(trimmed).toEpochMilli)
  }
}
