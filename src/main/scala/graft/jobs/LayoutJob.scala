package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Per-clustering metrics. `rows` is the swap-verified written count. */
final case class LayoutMetrics(
    filesBefore: Int, filesAfter: Int, rows: Long, clusterBy: Seq[String])

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
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    RewriteSwap.recover(fs, path)
    val before = RewriteSwap.dataFiles(fs, path)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val src = spark.read.parquet(dir)
    val rowsBefore = src.count()
    val out = src
      .repartitionByRange(nOut, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
    val rows = RewriteSwap.writeVerifySwap(spark, fs, path, out, rowsBefore, "layout")
    LayoutMetrics(before.length, RewriteSwap.dataFiles(fs, path).length,
      rows, cols)
  }
}
