package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The `bucket` function of [[GraftTableCatalog]]'s function catalog —
  * what lets Spark's STORAGE-PARTITIONED JOIN recognize two
  * bucket-partitioned log tables as co-partitioned and plan their join
  * with ZERO shuffle: `V2ScanPartitioningAndOrdering` resolves the
  * `bucket(N, col)` transform in [[LogBatchScan]]'s reported
  * `KeyGroupedPartitioning` against this catalog, and compatibility
  * across the two sides hangs on [[GraftBucketFunction.canonicalName]]
  * and the bucket count.
  *
  * The bound function REPRODUCES the write-time transform bit-exactly —
  * `pmod(xxhash64(key), N)` with Spark's default seed 42
  * ([[PartitionField]] `writeExpr`/`bucketOf`) — by evaluating the SAME
  * `XxHash64` Catalyst expression over the input row, so a partition
  * tuple recorded at write time, the planner's point-lookup gate, and
  * any value the join planner computes all agree. NULL keys hash to the
  * seed's bucket (the expression skips null children), matching the
  * write path; the result is never null. */
private[graft] object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(N, col): pmod(xxhash64(col), N) — the log format's hidden " +
      "bucket partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket takes (numBuckets INT, key), got $inputType")
    new GraftBucketFunction(inputType.fields(1).dataType)
  }
}

private[graft] final class GraftBucketFunction(keyType: DataType)
    extends ScalarFunction[Int] {
  // ordinal 1 = the key (ordinal 0 is the bucket-count literal)
  @transient private lazy val hasher =
    new XxHash64(Seq(BoundReference(1, keyType, nullable = true)), 42L)

  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def name(): String = "bucket"
  // the key type is part of the identity: xxhash64 of an INT and a
  // LONG differ, so cross-type buckets must never read as compatible
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"

  override def produceResult(input: InternalRow): Int = {
    val n = input.getInt(0)
    val h = hasher.eval(input).asInstanceOf[Long]
    (((h % n) + n) % n).toInt
  }
}
