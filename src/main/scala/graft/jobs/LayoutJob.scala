package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    *  3. ONE range exchange, partitioned on the key's top-bits cell id
    *     with 2× partition over-provisioning — every curve cell becomes
    *     exactly one output file (cuts can neither split a cell nor
    *     merge two, so each file's bounding box IS its cell; raw-key
    *     range cuts would bleed a cell's far corner into the neighboring
    *     file and blow that file's box to the full domain) — then a
    *     per-partition sort on the full key (row groups inside each file
    *     are narrow z-runs), key dropped before the write, the same
    *     verified swap.
    *
    * Numeric/timestamp columns rank through one `approxQuantile` pass;
    * string columns through a deterministic hash-ordered sample sorted
    * under UTF8String binary order (the ordering parquet string stats
    * skip on). Nulls map to bucket 0 (curve origin). At 100 TB the unit
    * is one partition directory, like [[CompactionJob.runPartitioned]].
    */
  def zorderBy(spark: SparkSession, dir: String, cols: Seq[String],
      targetFileBytes: Long = 128L << 20, bitsPerCol: Int = 12): LayoutMetrics = {
    require(cols.size >= 2, "zorderBy needs at least two columns (use clusterBy for one)")
    val (path, fs, before, nOut) = prepare(spark, dir, targetFileBytes)
    val src = spark.read.parquet(dir)
    val rowsBefore = src.count()
    val out = zorderOut(spark, src, cols, nOut, bitsPerCol)
    val rows = withRangeSample(spark) {
      RewriteSwap.writeVerifySwap(spark, fs, path, out, rowsBefore, "layout")
    }
    LayoutMetrics(before.length, RewriteSwap.dataFiles(fs, path).length,
      rows, cols)
  }

  /** [[zorderBy]] / [[zorderByLog]] shared transform: equi-depth rank
    * cuts, codegen'd Morton key + top-bits cell id, ONE range exchange
    * on the cell id (2x over-provisioned), full-key in-partition sort,
    * key dropped before the write. */
  private def zorderOut(spark: SparkSession, src: DataFrame, cols: Seq[String],
      nOut: Int, bitsPerCol: Int): DataFrame = {
    val zCol = "__graft_zorder_key"
    require(!src.columns.contains(zCol), s"layer already has a $zCol column")

    val buckets = 1 << bitsPerCol
    val schema = src.schema
    val strCols = cols.filter(c =>
      schema(c).dataType == org.apache.spark.sql.types.StringType)
    val numCols = cols.filterNot(strCols.contains)
    // one pass for ALL numeric columns' candidate cuts; dedupe collapses
    // the repeats a skewed/low-cardinality column produces
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val numCand: Map[String, Array[Double]] =
      if (numCols.isEmpty) Map.empty
      else numCols.zip(
        src.select(numCols.map(c => col(c).cast("double").as(c)): _*).stat
          .approxQuantile(numCols.toArray, probs, 1.0 / (2 * buckets))
          .map(_.distinct.sorted)).toMap
    // string cuts: deterministic uniform sample (hash-ordered top-N — a
    // bounded TakeOrdered, never a full collect), sorted under the SAME
    // binary comparison Spark's sort and the parquet stats use; the
    // resample below reduces it to equi-depth interior cuts
    import org.apache.spark.unsafe.types.UTF8String
    val strCand: Map[String, Array[String]] = strCols.map { c =>
      val sample = src.select(col(c)).na.drop()
        .orderBy(org.apache.spark.sql.functions.xxhash64(col(c)))
        .limit(8 * buckets)
        .collect().map(_.getString(0))
      c -> sample.distinct.sortWith((a, b) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    }.toMap
    val candidates: Seq[Array[_]] =
      cols.map(c => numCand.getOrElse(c, strCand(c)): Array[_])
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
    // evenly-ranked interior cut indices into a length-n candidate array
    def cutIdx(n: Int): Array[Int] =
      if (n <= effBuckets - 1) (0 until n).toArray
      else (1 until effBuckets).map(j => j * n / effBuckets).toArray

    val bucketCols = cols.map { c =>
      numCand.get(c) match {
        case Some(cand) =>
          graft.functions.ZOrderFunctions.rank_bucket(
            coalesce(col(c).cast("double"), lit(Double.NegativeInfinity)),
            cutIdx(cand.length).map(cand))
        case None =>
          // null strings bucket to 0: the expression is null-preserving,
          // the coalesce pins the curve origin like -Inf does for numerics
          val cand = strCand(c)
          coalesce(
            graft.functions.ZOrderFunctions.rank_bucket_str(
              col(c), cutIdx(cand.length).map(cand)),
            lit(0))
      }
    }
    // Partition on the key's top-bits CELL id, not the raw key: range
    // cuts sampled over the raw key can land INSIDE a curve cell, and
    // even a 1% bleed across a cell boundary puts that cell's far-corner
    // rows into the neighboring file — whose min/max then spans the full
    // domain and skips nothing. Quantizing the partition column to
    // ceil(log2(nOut)) leading bits means a cut can only fall AT a cell
    // boundary (cells are equi-depth by construction, so files stay
    // balanced); the within-partition sort still uses the full key so
    // row groups inside each file are narrow z-runs.
    val cellCol = "__graft_zorder_cell"
    val totalBits = effBits * cols.size
    val cellBits = math.min(totalBits,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nOut - 1L))).toInt
    val numCells = 1 << cellBits
    // 2x partition over-provisioning: with exactly as many partitions as
    // cells, the partitioner's greedy equal-weight walk coin-flips at
    // EVERY boundary (cells are equi-depth by construction, so each
    // cumulative weight sits exactly on a step) and routinely merges two
    // adjacent-in-key cells — whose union is no box at all. With 2x
    // partitions each cell's weight spans two steps, so every sampled
    // cell id becomes its own bound: a cell can neither split (equal
    // values never split) nor merge. Surplus partitions stay empty and
    // write no files.
    src
      .withColumn(zCol, graft.functions.ZOrderFunctions.interleave_bits(bucketCols, effBits))
      .withColumn(cellCol,
        org.apache.spark.sql.functions.shiftright(col(zCol), totalBits - cellBits))
      .repartitionByRange(2 * numCells, col(cellCol))
      .sortWithinPartitions(zCol)
      .drop(zCol, cellCol)
  }

  /** Scoped bump of the range-exchange boundary sample: 1000 draws per
    * partition over equi-depth cells makes a missed cell id vanishingly
    * rare at the per-maintenance-unit file counts these jobs target
    * (RangePartitioner caps the total draw at 1e6 rows). Restores the
    * previous value even on failure. */
  private def withRangeSample[T](spark: SparkSession)(body: => T): T = {
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.getOption(sampleKey)
    spark.conf.set(sampleKey, "1000")
    try body finally prev match {
      case Some(v) => spark.conf.set(sampleKey, v)
      case None => spark.conf.unset(sampleKey)
    }
  }

  /** [[zorderBy]] for a log-backed table: the same Morton-curve rewrite
    * committed as a `zorder` manifest — no swap window, sizing from the
    * manifest's byte total, and with `statsColumns` covering the curve
    * columns the committed per-file stats bound EVERY clustered
    * dimension, so [[graft.table.SnapshotLog.readBetween]] prunes on
    * ANY of them from the manifest alone. */
  def zorderByLog(log: graft.table.SnapshotLog, cols: Seq[String],
      targetFileBytes: Long = 128L << 20,
      bitsPerCol: Int = 12): graft.table.Snapshot = {
    require(cols.size >= 2, "zorderBy needs at least two columns (use clusterBy for one)")
    require(log.snapshot().partitionSpec.isEmpty,
      "zorderByLog on a hidden-partitioned table: the partitioned stage " +
        "re-routes rows by tuple, undoing a global curve layout — declare " +
        "sortBy on the table for within-partition clustering instead")
    val spark = log.session
    val nOut = graft.table.SnapshotLog.packedFileCount(
      log.snapshot().bytes, targetFileBytes)
    withRangeSample(spark) {
      log.rewrite("zorder")(df => zorderOut(spark, df, cols, nOut, bitsPerCol))
    }
  }

  /** [[clusterBy]] for a log-backed table ([[graft.table.SnapshotLog]]):
    * the same range-partitioned sort rewrite, committed as a `cluster`
    * manifest — no swap window, readers of the prior version are
    * undisturbed mid-rewrite, and output sizing comes from the
    * manifest's byte total (zero file listing). The z-order transform
    * composes through `log.rewrite` the same way; at 100 TB the unit
    * stays one partition's table, as for the directory path. */
  def clusterByLog(log: graft.table.SnapshotLog, cols: Seq[String],
      targetFileBytes: Long = 128L << 20): graft.table.Snapshot = {
    require(cols.nonEmpty, "clusterBy needs at least one column")
    require(log.snapshot().partitionSpec.isEmpty,
      "clusterByLog on a hidden-partitioned table: the partitioned stage " +
        "re-routes rows by tuple, undoing a global range layout — declare " +
        "sortBy on the table for within-partition clustering instead")
    val nOut = graft.table.SnapshotLog.packedFileCount(
      log.snapshot().bytes, targetFileBytes)
    log.rewrite("cluster")(_
      .repartitionByRange(nOut, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*))
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
