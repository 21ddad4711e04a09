package graft.table

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, element_at, input_file_name, split, udaf}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64

/** Per-file key bloom filters for [[SnapshotLog]] tables that declare
  * `bloomColumns` — the data-skipping index for POINT lookups, where
  * min/max ranges are useless unless the table happens to be clustered
  * on the key: an append-ordered or hash-shuffled file spans ~the whole
  * key range, so a `WHERE key IN (…)` read opens every file on range
  * stats alone; with blooms it opens only the files that can actually
  * hold a key (no false negatives by construction, ~1% false
  * positives).
  *
  * Built in ONE Spark job over the freshly staged files (a narrow scan
  * of just the bloom columns): a typed `Aggregator` whose buffer IS the
  * bloom — partial aggregation builds per-partition bitmaps map-side
  * and the shuffle ships O(files × bloom bytes), never O(rows). The
  * same `org.apache.spark.util.sketch.BloomFilter` probes at planning
  * time, so build and probe share one hash implementation — a
  * reimplementation drifting out of sync (the classic unsound-skipping
  * bug) is impossible.
  *
  * Blooms ride the manifest (base64) alongside the range stats: atomic
  * with the commit, zero extra GETs at planning. Sized at `fpp` for the
  * largest staged file. At 100 TB (millions of rows per file → ~1 MiB
  * of bloom per file) production would externalize them to sidecar
  * index files named by the manifest — Iceberg's puffin shape; the
  * encode/decode seam below is the only code that would move.
  *
  * Integral columns index as longs, strings as strings; other types get
  * no bloom (absence never prunes — same contract as the range stats).
  * NULLs are not indexed: a NULL never equals a lookup key.
  */
object FileBlooms {

  private final class LongBloomAgg(expected: Long, fpp: Double)
      extends Aggregator[java.lang.Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expected, fpp)
    override def reduce(b: BloomFilter, v: java.lang.Long): BloomFilter = {
      if (v != null) b.putLong(v.longValue); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = encode(b)
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class StringBloomAgg(expected: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expected, fpp)
    override def reduce(b: BloomFilter, v: String): BloomFilter = {
      if (v != null) b.putString(v); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = encode(b)
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private def encode(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  private def decode(b64: String): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(Base64.getDecoder.decode(b64)))

  /** True iff the column type is bloom-indexable as a long. */
  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  /** Build blooms for `paths` (freshly staged data files): returns
    * file name → column → base64 bloom. `expectedItems` sizes every
    * bloom (the largest staged file's row count — staged files are
    * evenly sized by construction). One job, one narrow scan. */
  def build(spark: SparkSession, paths: Seq[String], bloomColumns: Seq[String],
      expectedItems: Long, fpp: Double = 0.01): Map[String, Map[String, String]] = {
    if (paths.isEmpty || bloomColumns.isEmpty) return Map.empty
    val df = spark.read.parquet(paths: _*)
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = bloomColumns.filter(c =>
      fields.get(c).exists(dt => isIntegral(dt) || dt == StringType))
    if (cols.isEmpty) return Map.empty
    val n = math.max(expectedItems, 64L)
    val aggs = cols.map { c =>
      if (isIntegral(fields(c)))
        udaf(new LongBloomAgg(n, fpp), Encoders.LONG)(col(c).cast(LongType))
          .as(c)
      else
        udaf(new StringBloomAgg(n, fpp), Encoders.STRING)(col(c)).as(c)
    }
    df.groupBy(element_at(split(input_file_name(), "/"), -1).as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { row =>
        row.getString(0) -> cols.zipWithIndex.map { case (c, i) =>
          c -> Base64.getEncoder.encodeToString(row.getAs[Array[Byte]](i + 1))
        }.toMap
      }.toMap
  }

  /** True iff file `f`'s bloom for `column` might contain ANY of
    * `keys` — or there is no bloom (absence never prunes). `dt` is the
    * column's table type; keys probe under the same normalization the
    * build used (integral → long, string → string). */
  def mightContainAny(blooms: Map[String, Map[String, String]], f: String,
      column: String, keys: Seq[Any], dt: Option[DataType]): Boolean =
    blooms.get(f).flatMap(_.get(column)) match {
      case None => true
      case Some(b64) =>
        val bf = decode(b64)
        keys.exists { k =>
          dt match {
            case Some(t) if isIntegral(t) => bf.mightContainLong(asLong(k))
            case Some(StringType)         => bf.mightContainString(k.toString)
            case _                        => true // unknown type: never prune
          }
        }
    }

  private def asLong(k: Any): Long = k match {
    case n: Number => n.longValue
    case other =>
      throw new IllegalArgumentException(
        s"integral bloom column probed with non-numeric key: $other")
  }
}
