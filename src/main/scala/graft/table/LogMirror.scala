package graft.table

import org.apache.hadoop.fs.Path

/** Incremental, exactly-once replication of one [[SnapshotLog]] table
  * into another, driven by the change feed — the downstream-consumer
  * story for the table format (a training cluster's local copy, a
  * cross-region replica, a dev snapshot that trails production).
  *
  * The design carries NO cursor state of its own: the destination's
  * `txns` watermark IS the cursor. Each source version applies as
  * `dst.appendStream(delta, appId, batchId = srcVersion)`, so the
  * replay check rides the same manifest CAS as the commit itself — a
  * crash between versions, a rerun of the whole mirror, or two racing
  * mirror invocations all converge: a version already applied is
  * detected inside the destination's commit loop and skipped. (This is
  * the same idempotence contract streaming ingestion uses; the mirror
  * is just another exactly-once writer.)
  *
  * Per-version semantics:
  *  - `append` — the version's delta files ship as one append; O(new
  *    data) read, never O(table). Source files are read BY NAME from
  *    the version that added them, so later source rewrites don't
  *    disturb a trailing mirror (the [[SnapshotLog.vacuum]] horizon
  *    bounds how far behind a mirror may fall — same contract as
  *    production change-data-feed retention).
  *  - `compact` / `cluster` / `zorder` — skipped: the source changed
  *    physically, not logically, and the mirror keeps its own layout
  *    (maintenance is per-replica — the replica may be clustered for a
  *    different workload than the source).
  *  - `delete_keys` — the tombstone's key file replays as
  *    `dst.deleteKeys` riding the same txns watermark, so GDPR-style
  *    deletes propagate without shipping any data AND exactly-once:
  *    a rerun skips an already-applied key delete inside the
  *    destination's commit path, just like a replayed append.
  *  - `delete` / `merge` / `restore` — REFUSED (IllegalStateException):
  *    these change history in ways an insert-feed cannot express
  *    row-by-row (a copy-on-write rewrite mixes surviving old rows into
  *    new files; a restore rolls the logical table back). The error
  *    names the version so the operator can resync from a full read.
  *
  * Single-writer assumption on the destination: the mirror is the only
  * logical writer (destination-local maintenance — compact/cluster —
  * is fine: it commutes with appends at the next CAS retry).
  */
object LogMirror {

  /** Source ops a mirror can express as an insert/delete-key feed. */
  private val PhysicalOnly = Set("compact", "cluster", "zorder")

  /** Apply every source version after the destination's watermark, in
    * order. `appId` identifies THIS replication lane in the
    * destination's `txns` map — keep it stable across reruns (default:
    * the source table path). Returns the number of source versions
    * walked beyond the destination's watermark this invocation. The
    * watermark advances only on appends, so physical-only versions
    * trailing the last source append are re-walked (and re-skipped,
    * costing one manifest read each) by a rerun — harmless by
    * construction. */
  def mirror(src: SnapshotLog, dst: SnapshotLog,
      appId: String = ""): Long = {
    val lane = if (appId.nonEmpty) appId else s"mirror:${src.tableDir}"
    val srcCur = src.currentVersion()
    if (srcCur == 0) return 0L
    val applied =
      if (dst.currentVersion() == 0) 0L
      else dst.snapshot().txns.getOrElse(lane, 0L)
    var newlyApplied = 0L
    ((applied + 1) to srcCur).foreach { v =>
      val s = src.snapshot(v)
      s.op match {
        case "append" =>
          // the version's delta, read by file name from the source log
          dst.appendStream(src.readChanges(v - 1, v), lane, v)
          newlyApplied += 1
        case op if PhysicalOnly(op) =>
          newlyApplied += 1 // nothing logical to ship
        case "delete_keys" =>
          val parentTombs = snapshotTombstones(src, s.parent)
          // the one tombstone THIS version added over its parent
          s.tombstones.drop(parentTombs).foreach { t =>
            val keyFile = new Path(
              new Path(src.tableDir, SnapshotLog.DataDirName), t.file)
            dst.deleteKeys(t.column,
              src.session.read.parquet(keyFile.toString), Some((lane, v)))
          }
          newlyApplied += 1
        case other =>
          throw new IllegalStateException(
            s"cannot mirror ${src.tableDir} v$v: op '$other' is not " +
              "expressible as a change feed (copy-on-write rewrites mix " +
              "surviving rows into new files; restore rolls the table " +
              "back) — resync the replica from a full read of the source")
      }
    }
    newlyApplied
  }

  private def snapshotTombstones(src: SnapshotLog, version: Long): Int =
    if (version == 0) 0 else src.snapshot(version).tombstones.size
}
