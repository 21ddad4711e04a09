package graft.jobs

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared verified-swap protocol for whole-layer rewrite jobs
  * ([[CompactionJob]], [[LayoutJob]]): write the rewrite to a sibling
  * `.tmp`, verify the rows WRITTEN (an `Observation` riding the write
  * job — no re-read) against the source count, then swap via two renames
  * with a `.bak` safety copy. The local-FS directory rename stands in
  * for an atomic metadata commit; on object stores production puts a
  * table format's transaction log (Iceberg/Delta-style) or a metastore
  * partition-location flip in front of the same rewrite —
  * [[graft.table.SnapshotLog]] implements that protocol (manifest CAS,
  * no swap window at all) for tables that opt into the log layout; this
  * swap remains the path for bare directories the cataloged contract
  * pins in place.
  */
private[jobs] object RewriteSwap {

  def tmpPath(path: Path): Path =
    new Path(path.getParent, s".${path.getName}.compact.tmp")
  def bakPath(path: Path): Path =
    new Path(path.getParent, s".${path.getName}.compact.bak")

  /** Crash recovery, run BEFORE anything else: a prior job that died
    * mid-swap leaves artifacts the next run must not size or rewrite
    * around.
    *  - bak present, layer absent: died between the two renames — the
    *    complete pre-rewrite data is in bak; restore it and proceed.
    *  - bak present AND layer present: died after the second rename but
    *    before the bak delete (layer is the verified rewrite) — OR the
    *    layer was re-created by a later writer after a mid-swap crash,
    *    in which case bak holds data the layer does NOT. Indistinguishable
    *    from here, so fail loudly rather than guess.
    *  - tmp present: an UNVERIFIED partial rewrite from a dead run —
    *    source data is intact, so discard it and rewrite fresh. */
  def recover(fs: FileSystem, path: Path): Unit = {
    val (tmp, bak) = (tmpPath(path), bakPath(path))
    if (fs.exists(bak)) {
      if (!fs.exists(path)) {
        if (!fs.rename(bak, path))
          throw new IllegalStateException(
            s"rewrite recovery failed: could not restore $bak to $path")
      } else throw new IllegalStateException(
        s"both $path and $bak exist — a prior rewrite died mid-swap and " +
          "the layer may have diverged from the backup; resolve manually")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Non-hidden data files directly under `path`. */
  def dataFiles(fs: FileSystem, path: Path): Array[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(path).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Write `out` (a transformation of the layer at `path` that must
    * preserve every row) to `.tmp`, verify rows-written == `rowsBefore`,
    * swap into place. Returns the verified row count. On verification
    * failure the source layer is untouched and `.tmp` is deleted. */
  def writeVerifySwap(spark: SparkSession, fs: FileSystem, path: Path,
      out: DataFrame, rowsBefore: Long, jobTag: String): Long = {
    val (tmp, bak) = (tmpPath(path), bakPath(path))
    // rows-written comes from an Observation riding the write job itself
    // (CollectMetrics below the rewrite) — no second read pass over tmp
    val obs = new org.apache.spark.sql.Observation(s"graft_${jobTag}_${path.getName}")
    out.observe(obs, org.apache.spark.sql.functions
        .count(org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write
      .option("compression", "snappy")
      .mode("overwrite")
      .parquet(tmp.toString)
    val rowsAfter = obs.get("rows").asInstanceOf[Long]
    if (rowsAfter != rowsBefore) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"$jobTag row-count mismatch for $path: $rowsBefore before, " +
          s"$rowsAfter rewritten — aborted, source untouched")
    }
    if (!fs.rename(path, bak))
      throw new IllegalStateException(s"$jobTag swap failed: could not move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore — leave the layer exactly as found
      throw new IllegalStateException(s"$jobTag swap failed: could not move $tmp into place")
    }
    fs.delete(bak, true)
    rowsAfter
  }
}
