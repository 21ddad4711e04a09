package graft

import graft.ops.Export
import graft.table.SnapshotLog
import org.scalatest.funsuite.AnyFunSuite

/** Training-shard export contract: the committed layout equals the
  * declarative plan, re-exports are exactly-once, and the layout
  * invariants (budgeted bins, dense positions) hold. */
class ExportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("committed export equals the plan; shards dense; bins respect the budget") {
    val committed = Export.curExportShards(spark, dir).collect()
    assert(committed.nonEmpty)
    val planned = Export
      .exportPlan(graft.ops.Relational.t(spark, dir, "documents"))
      .orderBy("shard", "pos").collect()
    assert(committed.toSeq == planned.toSeq,
      "the table must hold exactly what the plan computed")
    // positions are dense 1..n per shard (a gap would mean a lost doc)
    committed.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val pos = rows.map(_.getInt(1)).sorted
      assert(pos.toSeq == (1 to pos.length), "dense shuffled positions")
    }
    // a document STARTS in bin b iff its first token lands there:
    // offsets within a bin never reach the budget boundary
    committed.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.sortBy(_.getInt(1)).foldLeft(0L) { (off, r) =>
        assert(r.getLong(2) == off / Export.ExportBudget,
          s"bin must be the contiguous-fill offset bucket: $r")
        off + r.getLong(4)
      }
    }
  }

  test("re-export with the same run key commits nothing (exactly-once)") {
    val table = Export.exportTable(spark, dir)
    val log = SnapshotLog(spark, table)
    val v = log.currentVersion()
    assert(v == 1, "the fixture's double-build must have committed once")
    assert(log.appendRun(
        Export.exportPlan(graft.ops.Relational.t(spark, dir, "documents")),
        s"export:$dir").isEmpty,
      "a third replay must also be skipped")
    assert(log.currentVersion() == v)
  }
}
