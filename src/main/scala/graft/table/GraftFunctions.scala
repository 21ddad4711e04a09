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

/** The TIME + truncate partition-transform functions of the catalog —
  * what lets the NATIVE batch write ([[LogAppendWrite]]) report
  * `days(ts)`-style clustered distributions Spark can resolve (and any
  * future key-grouped scan reporting over time specs). Each bound
  * function REPRODUCES [[PartitionField.writeExpr]]'s arithmetic
  * bit-exactly — the same tz-free epoch derivations — so a row's
  * cluster key is a bijection of its manifest tuple: rows of one tuple
  * colocate, and the rolling writer lands one file per tuple per task.
  *
  * All time transforms reduce to epoch arithmetic on the internal
  * representation (micros for timestamps — NTZ micros are 'local'
  * epoch micros, matching writeExpr's field extraction — days for
  * DATE), with `Math.floorDiv` giving the toward-minus-infinity
  * rounding `floor(double)` computes on the write path. */
private[graft] sealed abstract class GraftTimeUnbound(fname: String)
    extends UnboundFunction {
  override def name(): String = fname
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$fname takes one time column, got $inputType")
    val dt = inputType.fields(0).dataType
    require(dt == org.apache.spark.sql.types.TimestampType ||
      dt == org.apache.spark.sql.types.TimestampNTZType ||
      dt == org.apache.spark.sql.types.DateType,
      s"$fname needs a timestamp/date column, got ${dt.simpleString}")
    new GraftTimeFunction(fname, dt)
  }
}

private[graft] object GraftDaysUnbound extends GraftTimeUnbound("days") {
  override def description(): String =
    "days(ts): epoch day — the log format's day partition transform"
}
private[graft] object GraftHoursUnbound extends GraftTimeUnbound("hours") {
  override def description(): String =
    "hours(ts): epoch hour — the log format's hour partition transform"
}
private[graft] object GraftMonthsUnbound extends GraftTimeUnbound("months") {
  override def description(): String =
    "months(ts): epoch month — the log format's month partition transform"
}
private[graft] object GraftYearsUnbound extends GraftTimeUnbound("years") {
  override def description(): String =
    "years(ts): epoch year — the log format's year partition transform"
}

private[graft] final class GraftTimeFunction(fname: String, dt: DataType)
    extends ScalarFunction[java.lang.Long] { // boxed: a NULL source returns null
  import org.apache.spark.sql.types.DateType

  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = org.apache.spark.sql.types.LongType
  override def isResultNullable: Boolean = true
  override def name(): String = fname
  override def canonicalName(): String =
    s"graft.$fname(${dt.catalogString})"

  /** The column's epoch DAY (both timestamp kinds store micros; DATE
    * stores days directly). */
  private def epochDay(input: InternalRow): Long = dt match {
    case DateType => input.getInt(0).toLong
    case _        => Math.floorDiv(input.getLong(0), 86400000000L)
  }

  override def produceResult(input: InternalRow): java.lang.Long = {
    // a NULL source stays NULL, like writeExpr's null-propagating
    // arithmetic (null rows land the Hive default partition)
    if (input.isNullAt(0)) return null
    fname match {
      case "hours" =>
        dt match {
          case DateType => epochDay(input) * 24L // midnight of the date
          case _        => Math.floorDiv(input.getLong(0), 3600000000L)
        }
      case "days" => epochDay(input)
      case "months" =>
        val d = java.time.LocalDate.ofEpochDay(epochDay(input))
        (d.getYear - 1970).toLong * 12L + (d.getMonthValue - 1)
      case "years" =>
        (java.time.LocalDate.ofEpochDay(epochDay(input)).getYear - 1970).toLong
    }
  }
}

/** `truncate(W, col)` — substring for strings, `v - pmod(v, W)` for
  * integrals, exactly [[PartitionField.writeExpr]]'s forms. */
private[graft] object GraftTruncateUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(W, col): width-W prefix (strings) / multiple-of-W floor " +
      "(integrals) — the log format's truncate partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"truncate takes (width INT, col), got $inputType")
    new GraftTruncateFunction(inputType.fields(1).dataType)
  }
}

private[graft] final class GraftTruncateFunction(colType: DataType)
    extends ScalarFunction[Any] {
  import org.apache.spark.sql.types.{ByteType, IntegerType => IT, LongType, ShortType, StringType}

  require(colType == StringType || colType == ByteType ||
    colType == ShortType || colType == IT || colType == LongType,
    s"truncate partitions integral/string columns, got ${colType.simpleString}")

  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
  override def resultType(): DataType =
    if (colType == StringType) StringType else LongType
  override def isResultNullable: Boolean = true
  override def name(): String = "truncate"
  override def canonicalName(): String =
    s"graft.truncate(${colType.catalogString})"

  override def produceResult(input: InternalRow): Any = {
    // a NULL source stays NULL, like writeExpr (null rows land the
    // Hive default partition; the write distribution may see them)
    if (input.isNullAt(1)) return null
    val w = input.getInt(0)
    colType match {
      case StringType =>
        // writeExpr uses substring(c, 1, w) — character semantics
        input.getUTF8String(1).substringSQL(1, w)
      case ByteType  => floorTo(input.getByte(1).toLong, w)
      case ShortType => floorTo(input.getShort(1).toLong, w)
      case IT        => floorTo(input.getInt(1).toLong, w)
      case LongType  => floorTo(input.getLong(1), w)
    }
  }

  /** `v - pmod(v, w)` — the multiple-of-w floor, negative-safe. */
  private def floorTo(v: Long, w: Long): Long = v - (((v % w) + w) % w)
}
