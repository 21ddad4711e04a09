package graft.jobs

/** Common surface of the prepared-prefix maintenance rewrites —
  * [[CompactionJob]]'s bin-pack and [[LayoutJob]]'s clustering — so the
  * orchestrator can schedule either behind the same file-count threshold
  * and report what happened uniformly. */
trait MaintenanceMetrics {
  def filesBefore: Int
  def filesAfter: Int

  /** False when the pass decided the prefix was already in shape and
    * touched nothing (compaction's idempotent no-op). */
  def rewritten: Boolean
}

/** Metrics of a maintenance rewrite committed through the transaction
  * log ([[graft.table.SnapshotLog]]) — only constructed when a rewrite
  * actually committed (a no-op compact returns None upstream), so
  * `rewritten` is always true. `op` is the committed manifest op
  * (`compact` | `cluster` | `zorder`). */
final case class LogMaintenanceMetrics(filesBefore: Int, filesAfter: Int,
    rows: Long, op: String) extends MaintenanceMetrics {
  override def rewritten: Boolean = true
}
