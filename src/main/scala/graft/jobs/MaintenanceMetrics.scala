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
