package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Per-compaction metrics: what the layer looked like before/after. A
  * no-op pass (already compact) reports `filesAfter == filesBefore`,
  * `rewritten = false`, and `rows = None` — the no-op never reads the
  * data, so it has no row count to report. */
final case class CompactionMetrics(
    filesBefore: Int, filesAfter: Int, bytes: Long, rows: Option[Long],
    rewritten: Boolean) extends MaintenanceMetrics

/** Small-file compaction for the prepared layer.
  *
  * The reference's prepared layer is append-only — every promoted run
  * adds its own part files under the stable cataloged prefix
  * (reference: glue src/prepared_layer_job.py:116-130) and nothing ever
  * merges them. At one run per table per day that prefix accumulates
  * thousands of files per year; at 100 TB with thousands of pipelines the
  * scan-planning cost (file listing, footer reads, task-per-small-file
  * scheduling) comes to dominate query latency long before data volume
  * does. Compaction is the missing maintenance operator: bin-pack the
  * prefix back to ~`targetFileBytes` files, verify, swap.
  *
  * Shape:
  *  1. size the output from the actual on-disk bytes (footer-free file
  *     listing — no data read) → `ceil(bytes / targetFileBytes)` files;
  *  2. if the prefix already has that few files, do nothing (idempotent —
  *     a scheduled compactor must be safe to re-run);
  *  3. rewrite via `coalesce(n)` — a NARROW dependency: input splits are
  *     concatenated into n write tasks with NO shuffle (`repartition`
  *     would move every byte through an exchange for no layout benefit);
  *  4. verify the rewrite's row count against the source footers BEFORE
  *     any destructive step, then swap directories (rename old aside →
  *     rename new in → delete old).
  *
  * Scale notes: at 100 TB the unit of compaction is one partition
  * (ETL_PART_KEY value), selected by a file-count/avg-size threshold from
  * the same listing — never the whole table in one job; this entry point
  * takes the directory, so callers pass either. The local-FS directory
  * rename stands in for an atomic metadata commit; on object stores
  * rename is copy and non-atomic, which is why production deployments put
  * a table format's transaction log (Iceberg/Delta-style) or a Hive
  * metastore partition-location flip in front of the same rewrite —
  * [[graft.table.SnapshotLog]] implements that protocol (atomic manifest
  * CAS, time travel, listing-free planning; `SnapshotLog.compact` is
  * this same coalesce rewrite committed with NO swap window) for tables
  * that opt into the log layout.
  */
object CompactionJob {
  val JobName = "compaction_job"

  def run(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20): CompactionMetrics = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    RewriteSwap.recover(fs, path) // crash artifacts first — see RewriteSwap
    val before = RewriteSwap.dataFiles(fs, path)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (before.length <= nOut)
      return CompactionMetrics(before.length, before.length, bytes, None, rewritten = false)

    val src = spark.read.parquet(dir)
    // empty-required-schema scan: row counts come from row-group metadata,
    // no column data is decoded
    val rowsBefore = src.count()
    // coalesce is a NARROW rewrite: input splits concatenate into nOut
    // write tasks with no shuffle (`repartition` would move every byte
    // through an exchange for no layout benefit)
    val rows = RewriteSwap.writeVerifySwap(spark, fs, path,
      src.coalesce(nOut), rowsBefore, "compact")
    CompactionMetrics(before.length, RewriteSwap.dataFiles(fs, path).length,
      bytes, Some(rows), rewritten = true)
  }

  /** Compact a Hive-partitioned layer (e.g. the raw layer's
    * `ETL_PART_KEY=<runId>` directories) one partition at a time — the
    * actual unit of compaction at scale: each partition is an independent
    * bounded job, already-compact partitions are skipped by [[run]]'s
    * no-op check, and a failure mid-way leaves every completed partition
    * compacted and every untouched partition as it was (re-run to
    * resume). Returns per-partition metrics keyed by partition dir name. */
  def runPartitioned(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20): Map[String, CompactionMetrics] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(s => s.getPath.getName ->
        run(spark, s.getPath.toString, targetFileBytes))
      .toMap
  }
}
