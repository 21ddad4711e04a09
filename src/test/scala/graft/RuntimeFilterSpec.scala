package graft

import graft.table.{GraftTableCatalog, LogBatchScan, PartitionField, SnapshotLog}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[LogBatchScan]] — the optimizer-facing half of the DSv2 scan:
  * manifest-exact statistics ([[org.apache.spark.sql.connector.read
  * .SupportsReportStatistics]]) and runtime point-set file pruning
  * ([[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]],
  * Spark's dynamic partition pruning handing the joined-in key set to
  * the manifest gate before any fact file opens). */
class RuntimeFilterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def mount(root: String): String = {
    n += 1
    val cat = s"grt$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  /** 8-bucket fact table, `rows` ids, one append (8 bucket files). Ids
    * are hash-scattered across buckets, so RANGE stats cannot prune a
    * point — only the bucket-tuple gate can. */
  private def bucketedFact(root: String, rows: Int): SnapshotLog = {
    val log = SnapshotLog.partitioned(spark, s"$root/fact",
      Seq(PartitionField.bucket("id", 8)), statsColumns = Seq("id"))
    log.append((0 until rows).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    log
  }

  private def scansOf(plan: SparkPlan): Seq[BatchScanExec] = {
    val here = plan match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan) // AQE stages are leaves wrapping the real subtree
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scansOf(r.child)
      case b: BatchScanExec         => Seq(b)
      case _                        => Nil
    }
    here ++ plan.children.flatMap(scansOf) ++
      plan.subqueries.flatMap(scansOf)
  }

  test("manifest statistics reach the scan: exact rows and on-disk bytes") {
    val root = Files.createTempDirectory("graft-rf-").toString
    val log = bucketedFact(root, 200)
    val s = log.snapshot()
    val scan = new graft.table.LogScanBuilder(log, s.version,
      log.read().schema).build().asInstanceOf[LogBatchScan]
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 200L)
    assert(st.sizeInBytes().getAsLong == s.files.map(s.fileBytes).sum)
    // and the filterable attributes cover the bucket source + stats col
    assert(scan.filterAttributes().map(_.fieldNames().head).toSet == Set("id"))
  }

  test("a runtime IN predicate re-prunes the file list through the bucket gate") {
    val root = Files.createTempDirectory("graft-rf-").toString
    val log = bucketedFact(root, 200)
    val total = log.snapshot().files.size
    assert(total == 8)
    val scan = new graft.table.LogScanBuilder(log, log.currentVersion(),
      log.read().schema).build().asInstanceOf[LogBatchScan]
    scan.filter(Array(new V2Predicate("IN", Array(
      Expressions.column("id"),
      GraftBridge.v2Literal(7L, LongType), GraftBridge.v2Literal(7L, LongType)))))
    assert(scan.plannedFiles.size < total,
      s"bucket(7) must prune, still ${scan.plannedFiles.size}/$total")
    assert(scan.plannedFiles ==
      log.filesMatchingKeys("id", Seq(7L)))
    // the kept files still hold the matching row — pruning lost nothing
    val dataDir = new org.apache.hadoop.fs.Path(log.tableDir, "data")
    val kept = spark.read.parquet(scan.plannedFiles.map(f =>
      new org.apache.hadoop.fs.Path(dataDir, f).toString): _*)
    assert(kept.where(col("id") === 7L).count() == 1)
    // an unconvertible predicate degrades to a no-op, never drops files
    val before = scan.plannedFiles
    scan.filter(Array(new V2Predicate("STARTS_WITH", Array(
      Expressions.column("v"), GraftBridge.v2Literal(1L, LongType)))))
    assert(scan.plannedFiles == before)
    // IN over an empty/all-NULL key set provably matches nothing
    scan.filter(Array(new V2Predicate("IN", Array(
      Expressions.column("id"), GraftBridge.v2Literal(null, LongType)))))
    assert(scan.plannedFiles.isEmpty)
  }

  test("filesMatchingKeys: bloom + stats + bucket gates compose; empty keys match nothing") {
    val dir = Files.createTempDirectory("graft-rf-").toString + "/t"
    val log = new SnapshotLog(spark, dir, Seq("id"), None, Seq("id"))
    log.append((0 until 50).map(i => (i.toLong, i.toString)).toDF("id", "v").coalesce(1))
    log.append((1000 until 1050).map(i => (i.toLong, i.toString)).toDF("id", "v").coalesce(1))
    assert(log.filesMatchingKeys("id", Seq(1005L)).size == 1)
    assert(log.filesMatchingKeys("id", Seq(500L)).isEmpty,
      "a key in neither file's range must prune everything")
    assert(log.filesMatchingKeys("id", Nil).isEmpty)
    assert(log.filesMatchingKeys("id", Seq(3L, 1003L)).size == 2)
  }

  test("dynamic partition pruning end-to-end: the dim's keys prune fact files before I/O") {
    val root = Files.createTempDirectory("graft-rf-").toString
    val log = bucketedFact(root, 400)
    val total = log.snapshot().files.size
    val cat = mount(root)
    // the dim must be a real source: a LocalRelation's filter constant-
    // folds away before PartitionPruning looks for a selective predicate
    val dimPath = s"$root/dim"
    Seq((7L, "keep"), (23L, "drop")).toDF("k", "flag")
      .write.parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("rf_dim")
    val df = spark.sql(
      s"""SELECT f.id, f.v FROM $cat.fact f
         |JOIN rf_dim d ON f.id = d.k
         |WHERE d.flag = 'keep'""".stripMargin)
    val rows = df.collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "v7")))
    val scans = scansOf(df.queryExecution.executedPlan)
      .filter(_.scan.isInstanceOf[LogBatchScan])
    assert(scans.nonEmpty, "the fact side must plan as a LogBatchScan")
    val fact = scans.map(_.scan.asInstanceOf[LogBatchScan])
      .minBy(_.plannedFiles.size)
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "dynamic pruning must inject a runtime filter on the fact scan")
    assert(fact.plannedFiles.size < total,
      s"runtime keys must prune fact files: ${fact.plannedFiles.size}/$total")
  }
}
