package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** Per-clustering metrics. `rows` is the swap-verified written count.
  * A layout pass always rewrites (clustering can't be detected from a
  * file listing the way "already compact" can). */
final case class LayoutMetrics(
    filesBefore: Int, filesAfter: Int, rows: Long, clusterBy: Seq[String])
    extends MaintenanceMetrics {
  override def rewritten: Boolean = true
}

/** Sort-clustering (layout) maintenance for a parquet layer — the
  * data-skipping counterpart of [[CompactionJob]].
  *
  * Parquet stores per-row-group min/max statistics, and Spark's scan
  * pushes comparison predicates down to them — but the stats only SKIP
  * anything if the layout is clustered: in an append-only layer (each
  * promoted run writes its rows in arrival order) every row group spans
  * nearly the full value range of every column, so `WHERE k BETWEEN a
  * AND b` still reads every row group of 100 TB. Rewriting the layer
  * range-partitioned + sorted on the hot predicate columns makes the
  * per-file (and per-row-group) ranges narrow and disjoint, so the same
  * scan reads only the files whose range intersects the predicate — the
  * cheapest 100 TB lever after partition pruning, and entirely
  * plan-free: no engine feature is needed at read time, the footers do
  * the work. LayoutSpec proves the mechanism from the written footers
  * (disjoint per-file ranges after, full-range overlap before).
  *
  * Shape:
  *  1. `repartitionByRange(nOut, cols)` — ONE range-exchange over the
  *     layer (the sampling pass that computes boundaries is a metadata
  *     scan of the cluster columns only);
  *  2. `sortWithinPartitions(cols)` — a per-partition sort feeding the
  *     writer, so row-group stats inside each file are narrow too;
  *  3. the same verified swap as compaction ([[RewriteSwap]]): rows
  *     written are observed on the write job, the layer is replaced only
  *     after the count matches, crash artifacts recover on next entry.
  *
  * At scale the unit is one partition directory (like
  * [[CompactionJob.runPartitioned]]), scheduled when scan telemetry
  * shows hot range predicates on an unclustered column; clustering also
  * subsumes compaction (the rewrite bin-packs to `targetFileBytes`).
  */
object LayoutJob {
  val JobName = "layout_job"

  def clusterBy(spark: SparkSession, dir: String, cols: Seq[String],
      targetFileBytes: Long = 128L << 20): LayoutMetrics = {
    require(cols.nonEmpty, "clusterBy needs at least one column")
    val (path, fs, before, nOut) = prepare(spark, dir, targetFileBytes)
    val src = spark.read.parquet(dir)
    val rowsBefore = src.count()
    val out = src
      .repartitionByRange(nOut, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
    val rows = RewriteSwap.writeVerifySwap(spark, fs, path, out, rowsBefore, "layout")
    LayoutMetrics(before.length, RewriteSwap.dataFiles(fs, path).length,
      rows, cols)
  }

  /** Z-order (Morton-curve) clustering — the MULTI-column data-skipping
    * layout. [[clusterBy]]'s lexicographic sort skips only on the leading
    * column: inside every `x` run the trailing column still spans its
    * full range, so a predicate on `y` alone reads everything. Z-ordering
    * sorts on a bit-interleaved key of the columns' quantile ranks, so any
    * contiguous key interval (= any output file) is bounded in EVERY
    * dimension — a range predicate on ANY clustered column skips files
    * from the same plain parquet footers, with zero read-time engine
    * support.
    *
    * Shape (one extra cheap pass over [[clusterBy]]):
    *  1. one `approxQuantile` pass computes ≤ 2^bits − 1 equi-depth
    *     boundaries per column (driver-side plan constants; rank
    *     normalization keeps the curve balanced under skew — raw value
    *     bits would let a wide-range column dominate);
    *  2. each row's per-column buckets ([[graft.functions.RankBucket]],
    *     inline binary search) interleave into one long
    *     ([[graft.functions.InterleaveBits]]) — both codegen'd, so the
    *     key rides the scan's WholeStageCodegen span;
    *  3. `repartitionByRange` + per-partition sort on the key (the ONE
    *     range exchange), key dropped before the write, then the same
    *     verified swap.
    *
    * Columns must be castable to double (numeric/timestamp); nulls map to
    * bucket 0 (curve origin). At 100 TB the unit is one partition
    * directory, like [[CompactionJob.runPartitioned]].
    */
  def zorderBy(spark: SparkSession, dir: String, cols: Seq[String],
      targetFileBytes: Long = 128L << 20, bitsPerCol: Int = 12): LayoutMetrics = {
    require(cols.size >= 2, "zorderBy needs at least two columns (use clusterBy for one)")
    val (path, fs, before, nOut) = prepare(spark, dir, targetFileBytes)
    val src = spark.read.parquet(dir)
    val rowsBefore = src.count()
    val zCol = "__graft_zorder_key"
    require(!src.columns.contains(zCol), s"layer already has a $zCol column")

    val buckets = 1 << bitsPerCol
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val doubled = src.select(cols.map(c => col(c).cast("double").as(c)): _*)
    // one pass for ALL columns' candidate cuts; dedupe collapses the
    // repeats a skewed/low-cardinality column produces
    val candidates = doubled.stat
      .approxQuantile(cols.toArray, probs, 1.0 / (2 * buckets))
      .map(_.distinct.sorted)
    candidates.zip(cols).foreach { case (b, c) =>
      require(b.nonEmpty, s"cannot z-order on '$c': no non-null values") }
    // Bucket ids must FILL [0, 2^bits): with fewer distinct cut
    // candidates than 2^bits − 1 (small or low-cardinality data) the raw
    // ranks occupy only a prefix of the bucket space, so the Morton top
    // bit would split at the wrong percentile and the curve's recursive
    // quadrants collapse. Use the widest shared width every column can
    // fill, then resample each column to exactly 2^bits − 1 evenly-ranked
    // cuts (still ~equi-depth).
    val effBits = math.min(bitsPerCol,
      candidates.map(c => 63 - java.lang.Long.numberOfLeadingZeros(c.length + 1L)).min).max(1)
    val effBuckets = 1 << effBits
    val boundaries = candidates.map { c =>
      if (c.length <= effBuckets - 1) c
      else (1 until effBuckets).map(j => c(j * c.length / effBuckets)).toArray
    }

    val bucketCols = cols.zip(boundaries).map { case (c, b) =>
      graft.functions.ZOrderFunctions.rank_bucket(
        coalesce(col(c).cast("double"), lit(Double.NegativeInfinity)), b)
    }
    val out = src
      .withColumn(zCol, graft.functions.ZOrderFunctions.interleave_bits(bucketCols, effBits))
      .repartitionByRange(nOut, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
    val rows = RewriteSwap.writeVerifySwap(spark, fs, path, out, rowsBefore, "layout")
    LayoutMetrics(before.length, RewriteSwap.dataFiles(fs, path).length,
      rows, cols)
  }

  private def prepare(spark: SparkSession, dir: String,
      targetFileBytes: Long): (Path, org.apache.hadoop.fs.FileSystem, Array[org.apache.hadoop.fs.FileStatus], Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    RewriteSwap.recover(fs, path)
    val before = RewriteSwap.dataFiles(fs, path)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    (path, fs, before, nOut)
  }
}
