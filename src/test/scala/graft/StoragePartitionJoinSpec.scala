package graft

import graft.table.{GraftTableCatalog, PartitionField, SnapshotLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Storage-partitioned joins: two log tables bucket-partitioned the
  * same way on their join keys report
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * ([[graft.table.LogBatchScan.outputPartitioning]]) resolved through
  * the catalog's `bucket` function ([[graft.table.GraftBucketUnbound]]),
  * and Spark plans their join with ZERO shuffle — at 100 TB the
  * difference between moving both tables over the network and moving
  * nothing. */
class StoragePartitionJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def mount(root: String): String = {
    n += 1
    val cat = s"gspj$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    // getAll = explicit settings only; getOption would return a
    // registered conf's DEFAULT and restore would pin it explicitly
    val all = spark.conf.getAll
    val saved = pairs.map { case (k, _) => k -> all.get(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def shuffles(plan: SparkPlan): Seq[SparkPlan] = {
    val here = plan match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffles(q.plan)
      case s: ShuffleExchangeLike => Seq(s)
      case _ => Nil
    }
    here ++ plan.children.flatMap(shuffles)
  }

  private def setup(): (String, Map[Long, (String, String)]) = {
    val root = Files.createTempDirectory("graft-spj-").toString
    val a = SnapshotLog.partitioned(spark, s"$root/a",
      Seq(PartitionField.bucket("id", 8)))
    a.append((0 until 200).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    val b = SnapshotLog.partitioned(spark, s"$root/b",
      Seq(PartitionField.bucket("id", 8)))
    // a second append: multiple files per bucket must still group
    b.append((0 until 100).map(i => (i.toLong, s"b$i")).toDF("id", "w"))
    b.append((100 until 200).map(i => (i.toLong, s"b$i")).toDF("id", "w"))
    (root, (0 until 200).map(i => i.toLong -> (s"a$i", s"b$i")).toMap)
  }

  test("co-bucketed log tables join with ZERO shuffle; results exact") {
    val (root, expected) = setup()
    val cat = mount(root)
    val q = s"SELECT f.id, f.v, d.w FROM $cat.a f JOIN $cat.b d ON f.id = d.id"
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(q)
      val got = df.collect().map(r =>
        r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(got == expected)
      assert(shuffles(df.queryExecution.executedPlan).isEmpty,
        "co-bucketed tables must join without ANY exchange")
    }
    // control: same query without v2 bucketing shuffles both sides
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(q)
      assert(df.count() == 200)
      assert(shuffles(df.queryExecution.executedPlan).nonEmpty,
        "the control plan (no v2 bucketing) is the ordinary shuffle join")
    }
  }

  test("layout reporting: typed tuples group; null-marker tuples degrade to Unknown") {
    val root = Files.createTempDirectory("graft-spj-").toString
    // mixed bucket+identity: both decode to typed keys → key-grouped
    val t = SnapshotLog.partitioned(spark, s"$root/t",
      Seq(PartitionField.bucket("id", 4), PartitionField("id2", "identity")))
    t.append((0 until 20).map(i => (i.toLong, (i % 2).toLong, s"x$i"))
      .toDF("id", "id2", "v"))
    val scan = new graft.table.LogScanBuilder(t, t.currentVersion(),
      t.read().schema).build().asInstanceOf[graft.table.LogBatchScan]
    assert(scan.outputPartitioning()
      .isInstanceOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning],
      "a mixed bucket+identity spec with decodable tuples groups")
    // a NULL identity value lands the Hive null-marker tuple — the scan
    // must degrade to Unknown rather than invent a key for it
    val n = SnapshotLog.partitioned(spark, s"$root/n",
      Seq(PartitionField("id2", "identity")))
    n.append(Seq((1L, Some(5L), "a"), (2L, None, "b"))
      .toDF("id", "id2", "v"))
    val ns = new graft.table.LogScanBuilder(n, n.currentVersion(),
      n.read().schema).build().asInstanceOf[graft.table.LogBatchScan]
    assert(ns.outputPartitioning()
      .isInstanceOf[org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning],
      "null-marker tuples must not claim key-grouped layout")
    // pure-bucket spec reports the grouped layout
    val u = SnapshotLog.partitioned(spark, s"$root/u",
      Seq(PartitionField.bucket("id", 4)))
    u.append((0 until 40).map(i => (i.toLong, s"x$i")).toDF("id", "v"))
    val us = new graft.table.LogScanBuilder(u, u.currentVersion(),
      u.read().schema).build().asInstanceOf[graft.table.LogBatchScan]
    val kg = us.outputPartitioning()
    assert(kg.isInstanceOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning])
    assert(kg.asInstanceOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]
      .numPartitions() == 4)
  }

  test("subset-key SPJ: bucket(8) joins bucket(8)+identity on the bucket key alone, zero shuffle") {
    val root = Files.createTempDirectory("graft-spj-sub-").toString
    val a = SnapshotLog.partitioned(spark, s"$root/a",
      Seq(PartitionField.bucket("id", 8)))
    a.append((0 until 120).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    // b carries a FINER spec: same bucket(8, id) plus identity(grp) —
    // the join key (id) is a SUBSET of b's partition keys, the shape
    // Spark's allowJoinKeysSubsetOfPartitionKeys serves by grouping
    // b's finer key tuples under the shared bucket prefix
    val b = SnapshotLog.partitioned(spark, s"$root/b",
      Seq(PartitionField.bucket("id", 8), PartitionField("grp", "identity")))
    b.append((0 until 120).map(i => (i.toLong, (i % 3).toLong, s"b$i"))
      .toDF("id", "grp", "w"))
    val cat = mount(root)
    // d.grp must stay in the scan output: a partition expression whose
    // source column is pruned away cannot be translated, and the scan
    // degrades to UnknownPartitioning (Spark's own SPJ suites keep the
    // partition columns selected for the same reason)
    val q = s"SELECT f.id, f.v, d.w, d.grp " +
      s"FROM $cat.a f JOIN $cat.b d ON f.id = d.id"
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(q)
      val got = df.collect().map(r =>
        r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(got ==
        (0 until 120).map(i => i.toLong -> (s"a$i", s"b$i")).toMap)
      assert(shuffles(df.queryExecution.executedPlan).isEmpty,
        "a join on the shared bucket prefix must not shuffle either side")
    }
  }

  test("partially-clustered SPJ: a skewed side splits per file, still zero shuffle, exact rows") {
    val root = Files.createTempDirectory("graft-spj-pc-").toString
    val a = SnapshotLog.partitioned(spark, s"$root/a",
      Seq(PartitionField.bucket("id", 4)))
    a.append((0 until 40).map(i => (i.toLong % 8, s"a$i")).toDF("id", "v"))
    // b is SKEWED: bucket of id=0 carries far more files/rows — three
    // appends land three files in the hot bucket
    val b = SnapshotLog.partitioned(spark, s"$root/b",
      Seq(PartitionField.bucket("id", 4)))
    (0 until 3).foreach(_ =>
      b.append((0 until 30).map(i => (0L, s"b$i")).toDF("id", "w").coalesce(1)))
    b.append((0 until 8).map(i => (i.toLong, s"c$i")).toDF("id", "w").coalesce(1))
    val cat = mount(root)
    val q = s"SELECT f.id, d.w FROM $cat.a f JOIN $cat.b d ON f.id = d.id"
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(q)
      // exact expected multiset: per id, |a rows| × |b rows|
      val aCnt = (0 until 40).groupBy(_ % 8).view.mapValues(_.size).toMap
      val bCnt = Map(0L -> 91L) ++ (1L to 7L).map(_ -> 1L).toMap
      val expect = (0 until 8).map(i =>
        i.toLong -> aCnt(i).toLong * bCnt(i.toLong)).toMap
      val got = df.groupBy("id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"partially-clustered join rows: $got vs $expect")
      assert(shuffles(df.queryExecution.executedPlan).isEmpty,
        "the skew-split co-partitioned join must still move nothing")
    }
  }

  test("day-partitioned tables join with ZERO shuffle: time transforms group like buckets") {
    val root = Files.createTempDirectory("graft-spj-day-").toString
    import org.apache.spark.sql.functions.{col, expr}
    def dayed(n: String): SnapshotLog = {
      val log = SnapshotLog.partitioned(spark, s"$root/$n",
        Seq(PartitionField("ts", "day")))
      log.append(spark.range(0, 120, 1, 4)
        .withColumn("ts", expr(
          "timestamp_micros((id % 3) * 86400000000 + 1700000000000000)"))
        .withColumn(if (n == "a") "v" else "w", expr("CAST(id AS STRING)"))
        .drop("id"))
      log
    }
    dayed("a")
    dayed("b")
    val cat = mount(root)
    val q = s"""SELECT f.ts, count(*) AS n FROM $cat.a f
               |JOIN $cat.b d ON f.ts = d.ts GROUP BY f.ts""".stripMargin
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(q)
      // 3 days × 40 rows per side, all rows of a day share one ts value?
      // no — ts has 3 distinct values; the join is 40×40 per day
      assert(df.collect().map(_.getLong(1)).sorted.toSeq == Seq(1600L, 1600L, 1600L))
      val joinShuffles = shuffles(df.queryExecution.executedPlan)
      // the GROUP BY may shuffle; the JOIN itself must not — no exchange
      // may sit BELOW the join
      val plan = df.queryExecution.executedPlan.toString
      val joinAt = plan.indexOf("SortMergeJoin")
      assert(joinAt >= 0, plan.take(1500))
      assert(!plan.substring(joinAt).contains("Exchange"),
        s"day-aligned sides must join with no shuffle below the join:\n" +
          plan.substring(joinAt).take(1200))
    }
  }
}
