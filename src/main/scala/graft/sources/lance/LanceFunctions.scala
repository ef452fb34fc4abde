package graft.sources.lance

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Catalog-served V2 functions. The only one today is `bucket`, which
  * exists so Spark can RESOLVE the `bucket(N, col)` transform that
  * bucketed-table scans report as their KeyGroupedPartitioning — the
  * resolution step (`V2ExpressionUtils.loadV2FunctionOpt`) asks the
  * table's catalog for the function, and two scans whose transforms bind
  * to the same `canonicalName` are co-partitioned, unlocking the
  * storage-partitioned (shuffle-free) join.
  *
  * The function body computes exactly what the write-side shuffle
  * computed — `pmod(murmur3(col), N)` in int arithmetic, the
  * HashPartitioning row→partition mapping — so if Spark ever needs to
  * evaluate it (e.g. shuffling a non-bucketed side into a compatible
  * layout), the values land in the right buckets.
  */
object LanceBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) = pmod(murmur3(col), numBuckets) — the write.bucket-by layout"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, value), got ${inputType.catalogString}")
    LanceBucketBound(inputType.fields(1).dataType)
  }
}

case class LanceBucketBound(valueType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.lance.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = Shim.murmur3Hash(input.get(1, valueType), valueType)
    Integer.valueOf(((h % n) + n) % n)
  }
}
