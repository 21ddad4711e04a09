package graft

import graft.table.{GraftTableCatalog, SnapshotLog}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SQL stored procedures ([[graft.table.GraftProcedures]] via the DSv2
  * `ProcedureCatalog`): the log's maintenance/lifecycle verbs callable
  * as `CALL cat.system.<proc>(...)`, each routing to the same
  * transactional method the typed API uses and returning a one-row
  * result. */
class ProcedureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def mounted(): (String, String, SnapshotLog) = {
    val root = Files.createTempDirectory("graft-proc-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    (0 until 4).foreach { run =>
      log.append((0 until 25).map(i => (run * 25 + i, s"r$run-$i"))
        .toDF("id", "v").coalesce(1))
    }
    n += 1
    val cat = s"gproc$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root, log)
  }

  test("CALL compact/vacuum: maintenance from SQL, results report the outcome") {
    val (cat, _, log) = mounted()
    assert(log.snapshot().files.size == 4)
    val out = spark.sql(s"CALL $cat.system.compact(table => 't1')")
      .collect().head
    assert(out.getLong(0) == log.currentVersion() &&
      out.getLong(1) == log.snapshot().files.size.toLong)
    assert(log.snapshot().files.size == 1 && log.snapshot().op == "compact")
    assert(log.read().count() == 100)
    // vacuum with an explicit retention; grace 0 sweeps the pre-compact files
    val deleted = spark.sql(
      s"CALL $cat.system.vacuum(table => 't1', keep_last => 1, grace_ms => 0)")
      .collect().head.getLong(0)
    assert(deleted == 4, s"the four replaced files must sweep: $deleted")
  }

  test("CALL restore + create_tag/drop_tag: history control from SQL") {
    val (cat, _, log) = mounted()
    val v = spark.sql(
      s"CALL $cat.system.create_tag(table => 't1', name => 'rc1', version => 2)")
      .collect().head.getLong(0)
    assert(v == 2L && log.tags() == Map("rc1" -> 2L))
    val restored = spark.sql(
      s"CALL $cat.system.restore(table => 't1', version => 2)")
      .collect().head.getLong(0)
    assert(restored == log.currentVersion())
    assert(log.read().count() == 50, "the restore must land (v2 had 2 appends)")
    spark.sql(s"CALL $cat.system.drop_tag(table => 't1', name => 'rc1')")
    assert(log.tags().isEmpty)
  }

  test("CALL branch lifecycle: create, audit via SQL, publish — the WAP loop without Scala") {
    val (cat, root, log) = mounted()
    spark.sql(s"CALL $cat.system.create_branch(table => 't1', name => 'wap')")
    val b = log.branch("wap")
    b.deleteBetween("id", 0, 9)
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    assert(s.sql(
      s"SELECT count(*) AS n FROM graft_log('$root/t1', 'branch:wap')")
      .head().getLong(0) == 90, "SQL audit read of the branch")
    val v = spark.sql(
      s"CALL $cat.system.publish_branch(table => 't1', name => 'wap')")
      .collect().head.getLong(0)
    assert(v == log.currentVersion() && log.read().count() == 90)
    assert(log.branches().isEmpty)
  }

  test("CALL materialize_deletes drains a vector; unknown procedure refuses with the roster") {
    val (cat, _, log) = mounted()
    log.deleteBetween("id", 3, 4) // sparse → deletion vector
    assert(log.snapshot().dvs.nonEmpty)
    spark.sql(s"CALL $cat.system.materialize_deletes(table => 't1')")
    assert(log.snapshot().dvs.isEmpty && log.read().count() == 98)
    val ex = intercept[Exception] {
      spark.sql(s"CALL $cat.system.no_such_proc(table => 't1')")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("no procedure")), msgs(ex).mkString(" | "))
  }
}
