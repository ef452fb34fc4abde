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
    require(inputType.fields.length >= 2,
      s"bucket takes (numBuckets, value...), got ${inputType.catalogString}")
    LanceBucketBound(inputType.fields.drop(1).map(_.dataType).toSeq)
  }
}

case class LanceBucketBound(valueTypes: Seq[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = (IntegerType +: valueTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.lance.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // seed-chained murmur3 over the key columns, truncating to Int between
    // steps (sign-extended back to the next seed) — exactly the fold
    // HashPartitioning's Murmur3Hash expression performs
    var h = 42
    var i = 0
    while (i < valueTypes.length) {
      h = Shim.murmur3Hash(input.get(i + 1, valueTypes(i)), valueTypes(i), h.toLong).toInt
      i += 1
    }
    Integer.valueOf(((h % n) + n) % n)
  }
}
