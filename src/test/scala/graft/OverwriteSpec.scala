package graft

import graft.table.{GraftTableCatalog, PartitionField, SnapshotLog}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Region overwrite ([[SnapshotLog.overwriteWhere]] — op
  * `replace_where`) and its SQL spelling (`INSERT OVERWRITE ...
  * PARTITION (c = v)` via SupportsOverwrite): the fused delete+append
  * commit, metadata-only whole-partition swaps, straddler survivors,
  * NULL semantics, CDC images, and mirror replay. */
class OverwriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-ovw-").resolve("t").toString

  test("whole-partition swap is metadata-only; untouched partitions carry by name") {
    val log = SnapshotLog.partitioned(spark, fresh(),
      Seq(PartitionField.identity("grp")), statsColumns = Seq("id"))
    log.append((0 until 12).map(i => (i.toLong, (i % 3).toLong, s"a$i"))
      .toDF("id", "grp", "v")) // v1: grp 0, 1, 2 — one file each
    val before = log.snapshot()
    val keep = before.files.filter(f =>
      before.partitions(f).head != "1")
    val s = log.overwriteWhere(Seq(("grp", 1L, 1L)),
      Seq((100L, 1L, "new1"), (101L, 1L, "new2")).toDF("id", "grp", "v"))
    assert(s.op == "replace_where")
    assert(keep.forall(s.files.contains),
      "untouched partitions must carry BY NAME — a swap of grp=1 may " +
        "not rewrite grp=0/2")
    assert(s.changes.isEmpty || s.changes.get.files.isEmpty,
      "no CDC opt-in: no images recorded")
    val out = log.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet
    val expect = (0 until 12).filter(_ % 3 != 1)
      .map(i => (i.toLong, (i % 3).toLong, s"a$i")).toSet ++
      Set((100L, 1L, "new1"), (101L, 1L, "new2"))
    assert(out == expect)
    assert(s.rows == 10 && log.read().count() == 10)
  }

  test("straddling region rewrites survivors; NULL predicate rows always survive") {
    val log = SnapshotLog(spark, fresh(), statsColumns = Seq("id"))
    log.append(Seq[(Option[Long], String)](
      (Some(1L), "a"), (Some(2L), "b"), (Some(3L), "c"), (None, "n"))
      .toDF("id", "v").coalesce(1))
    val s = log.overwriteWhere(Seq(("id", 2L, 3L)),
      Seq((Some(20L), "B")).toDF("id", "v"))
    val out = log.read().select("id", "v")
      .as[(Option[Long], String)].collect().toSet
    assert(out == Set((Some(1L), "a"), (None, "n"), (Some(20L), "B")),
      s"survivors + NULL row + the batch, got $out")
    assert(s.rows == 3)
    // an uncoercible bound matches nothing: the swap degrades to append
    val s2 = log.overwriteWhere(Seq(("id", "zzz", "zzz")),
      Seq((Some(30L), "C")).toDF("id", "v"))
    assert(s2.op == "replace_where" && log.read().count() == 4)
  }

  test("CDC: replace_where images net; the mirror replays the swap from preds + inserts") {
    val src = SnapshotLog.withChangeFeed(spark, fresh(),
      statsColumns = Seq("id"))
    src.append((0 until 10).map(i => (i.toLong, s"a$i"))
      .toDF("id", "v").coalesce(1)) // v1
    src.overwriteWhere(Seq(("id", 0L, 4L)),
      Seq((100L, "x")).toDF("id", "v")) // v2: 5 deleted, 1 inserted
    val feed = src.readChangeRows(1, 2)
    val byType = feed.groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 5L, "insert" -> 1L), byType.toString)
    // signed fold nets to the table
    assert(feed.where(col("_change_type") === "insert").count() -
      feed.where(col("_change_type") === "delete").count() ==
      src.read().count() - 10)
    // mirror: the replica replaces ITS region from preds + insert images
    val dst = SnapshotLog(spark, fresh())
    graft.table.LogMirror.mirror(src, dst)
    assert(dst.read().select("id", "v").as[(Long, String)].collect().toSet ==
      src.read().select("id", "v").as[(Long, String)].collect().toSet)
    graft.table.LogMirror.mirror(src, dst) // idempotent re-walk
    assert(dst.read().count() == 6)
  }

  test("SQL INSERT OVERWRITE: unconditioned replaces all; PARTITION (c = v) swaps one partition") {
    val root = Files.createTempDirectory("graft-ovw-sql-").toString
    val log = SnapshotLog.partitioned(spark, s"$root/t",
      Seq(PartitionField.identity("grp")), statsColumns = Seq("id"))
    log.append((0 until 9).map(i => (i.toLong, (i % 3).toLong, s"a$i"))
      .toDF("id", "grp", "v"))
    val cat = "govw"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val before = log.snapshot()
    val keep = before.files.filter(f => before.partitions(f).head != "2")
    // static partition overwrite: ONE fused replace_where commit
    spark.sql(s"INSERT OVERWRITE $cat.t PARTITION (grp = 2) " +
      "VALUES (200L, 'n1'), (201L, 'n2')")
    assert(log.snapshot().op == "replace_where",
      s"partition overwrite must fuse, got '${log.snapshot().op}'")
    assert(keep.forall(log.snapshot().files.contains),
      "other partitions carry by name")
    val out = spark.sql(s"SELECT id, grp, v FROM $cat.t ORDER BY id")
      .as[(Long, Long, String)].collect().toSet
    assert(out == ((0 until 9).filter(_ % 3 != 2)
      .map(i => (i.toLong, (i % 3).toLong, s"a$i")).toSet ++
      Set((200L, 2L, "n1"), (201L, 2L, "n2"))), out.toString)
    // unconditioned INSERT OVERWRITE = atomic full replace
    spark.sql(s"INSERT OVERWRITE $cat.t VALUES (1L, 0L, 'only')")
    assert(log.snapshot().op == "overwrite")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1)
  }

  test("dynamic partition overwrite: the batch's tuples define the swap; mirror replays; spec drift refuses") {
    val src = new SnapshotLog(spark, fresh(), Seq("id"),
      partitionBy = Seq(PartitionField.identity("grp")),
      changeFeed = true)
    src.append((0 until 12).map(i => (i.toLong, (i % 3).toLong, s"a$i"))
      .toDF("id", "grp", "v")) // v1: grp 0, 1, 2
    val before = src.snapshot()
    val keep = before.files.filter(f => before.partitions(f).head == "0")
    // the batch touches grp 1 and 2 — exactly those partitions swap
    val s = src.overwritePartitions(
      Seq((100L, 1L, "n1"), (101L, 2L, "n2")).toDF("id", "grp", "v")).get
    assert(s.op == "replace_where")
    assert(keep.forall(s.files.contains), "grp=0 must carry by name")
    assert(src.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet ==
      ((0 until 12).filter(_ % 3 == 0)
        .map(i => (i.toLong, (i % 3).toLong, s"a$i")).toSet ++
        Set((100L, 1L, "n1"), (101L, 2L, "n2"))))
    // empty batch: replaces nothing, commits nothing
    assert(src.overwritePartitions(
      spark.createDataFrame(spark.sparkContext.emptyRDD[
        org.apache.spark.sql.Row], src.read().schema)).isEmpty)
    // mirror with the SAME spec replays the swap exactly
    val dst = SnapshotLog.partitioned(spark, fresh(),
      Seq(PartitionField.identity("grp")))
    graft.table.LogMirror.mirror(src, dst)
    assert(dst.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet ==
      src.read().select("id", "grp", "v").as[(Long, Long, String)]
        .collect().toSet)
    graft.table.LogMirror.mirror(src, dst) // idempotent re-walk
    assert(dst.read().count() == 6)
    // a replica on a DIFFERENT spec CONVERGES automatically: the mirror
    // adopts the source's spec and folds that version to a full refresh
    // (the old manual-resync contract, performed by the mirror itself)
    val src2 = new SnapshotLog(spark, fresh(),
      partitionBy = Seq(PartitionField.identity("grp")),
      changeFeed = true)
    src2.append(Seq((1L, 0L, "a"), (3L, 1L, "c")).toDF("id", "grp", "v"))
    src2.overwritePartitions(Seq((2L, 0L, "b")).toDF("id", "grp", "v"))
    val dstFlat = SnapshotLog(spark, fresh())
    graft.table.LogMirror.mirror(src2, dstFlat)
    assert(dstFlat.snapshot().partitionSpec ==
      Seq(PartitionField.identity("grp")),
      "the resync must adopt the source's spec for future tuple replays")
    assert(dstFlat.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet ==
      Set((2L, 0L, "b"), (3L, 1L, "c")))
    graft.table.LogMirror.mirror(src2, dstFlat) // idempotent re-walk
    assert(dstFlat.read().count() == 2)
    // and AFTER convergence, the next dynamic overwrite replays
    // incrementally by tuple — no second refresh
    src2.overwritePartitions(Seq((5L, 1L, "d")).toDF("id", "grp", "v"))
    graft.table.LogMirror.mirror(src2, dstFlat)
    assert(dstFlat.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet ==
      Set((2L, 0L, "b"), (5L, 1L, "d")))
  }

  test("SQL dynamic partition overwrite: INSERT OVERWRITE under dynamic mode swaps touched tuples") {
    val root = Files.createTempDirectory("graft-ovw-dyn-").toString
    val log = SnapshotLog.partitioned(spark, s"$root/t",
      Seq(PartitionField.identity("grp")), statsColumns = Seq("id"))
    log.append((0 until 12).map(i => (i.toLong, (i % 3).toLong, s"a$i"))
      .toDF("id", "grp", "v")) // grp 0, 1, 2
    val before = log.snapshot()
    val keep = before.files.filter(f => before.partitions(f).head == "0")
    graft.ops.Relational.withConfs(spark,
      "spark.sql.catalog.govd" -> classOf[GraftTableCatalog].getName,
      "spark.sql.catalog.govd.root" -> root,
      "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      // no PARTITION clause: under dynamic mode the batch's tuples
      // (grp 1 and 2) define the swap — OverwritePartitionsDynamic has
      // no V1 fallback; this runs the native batch write end-to-end
      spark.sql(
        """INSERT OVERWRITE govd.t
          |VALUES (100L, 1L, 'n1'), (101L, 2L, 'n2')""".stripMargin)
    }
    val s = log.snapshot()
    assert(s.op == "replace_where",
      s"dynamic SQL overwrite must commit the tuple swap, got '${s.op}'")
    assert(keep.forall(s.files.contains), "grp=0 must carry by name")
    assert(log.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet ==
      ((0 until 12).filter(_ % 3 == 0)
        .map(i => (i.toLong, (i % 3).toLong, s"a$i")).toSet ++
        Set((100L, 1L, "n1"), (101L, 2L, "n2"))))
    // STATIC mode (the default) on the same table still replaces ALL
    graft.ops.Relational.withConfs(spark,
      "spark.sql.catalog.govd" -> classOf[GraftTableCatalog].getName,
      "spark.sql.catalog.govd.root" -> root) {
      spark.sql("INSERT OVERWRITE govd.t VALUES (200L, 0L, 'z')")
    }
    assert(log.read().count() == 1 && log.snapshot().op == "overwrite")
  }

  test("mirror converges across an evolve_spec boundary without operator action") {
    // source: identity(grp) → evolve to bucket(id) → dynamic overwrite
    val src = new SnapshotLog(spark, fresh(), Seq("id"),
      partitionBy = Seq(PartitionField.identity("grp")),
      changeFeed = true)
    src.append((0 until 8).map(i => (i.toLong, (i % 2).toLong, s"a$i"))
      .toDF("id", "grp", "v"))                                       // v1
    val dst = SnapshotLog.partitioned(spark, fresh(),
      Seq(PartitionField.identity("grp")))
    graft.table.LogMirror.mirror(src, dst) // in sync, same spec
    src.evolvePartitionSpec(Seq(PartitionField.identity("v")))       // v2
    src.compact()                      // v3: source converges its layout
    src.overwritePartitions(Seq((100L, 9L, "a1")).toDF("id", "grp", "v")) // v4
    // the replica is two spec generations behind at the dynamic replay:
    // evolve_spec was physical-only, so its spec still says grp — the
    // mirror must fold to a refresh and adopt identity(v), not refuse
    graft.table.LogMirror.mirror(src, dst)
    assert(dst.snapshot().partitionSpec == Seq(PartitionField.identity("v")))
    assert(dst.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet ==
      src.read().select("id", "grp", "v")
        .as[(Long, Long, String)].collect().toSet)
    graft.table.LogMirror.mirror(src, dst) // idempotent re-walk
    assert(dst.read().count() == src.read().count())
  }

  test("CDC: a dropped file carrying a deletion vector images only its LIVE rows") {
    val src = new SnapshotLog(spark, fresh(), Seq("id"),
      partitionBy = Seq(PartitionField.identity("grp")),
      changeFeed = true)
    src.append((0 until 12).map(i => (i.toLong, (i % 2).toLong, s"a$i"))
      .toDF("id", "grp", "v")) // v1: grp 0 (even ids), grp 1 (odd ids)
    src.deleteBetween("id", 2L, 2L) // v2: sparse match → deletion vector
    assert(src.snapshot().dvs.nonEmpty, "precondition: the delete vectored")
    val v2 = src.currentVersion()
    // the swap drops the DV-carrying grp-0 file; its pre-images must be
    // the LIVE rows (position 2 already died at v2 — re-imaging it would
    // double-count the delete in any signed fold over the feed)
    src.overwritePartitions(Seq((100L, 0L, "n")).toDF("id", "grp", "v"))
    val feed = src.readChangeRows(v2, v2 + 1)
    val dels = feed.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet
    assert(dels == Set(0L, 4L, 6L, 8L, 10L),
      s"live grp-0 rows only, got $dels")
    assert(feed.where(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSeq == Seq(100L))
    // the mirror's dynamic replay (insert-filtered) is unaffected
    val dst = SnapshotLog.partitioned(spark, fresh(),
      Seq(PartitionField.identity("grp")))
    graft.table.LogMirror.mirror(src, dst)
    assert(dst.read().select("id", "grp", "v")
      .as[(Long, Long, String)].collect().toSet ==
      src.read().select("id", "grp", "v")
        .as[(Long, Long, String)].collect().toSet)
  }

  test("guards: pending tombstones refuse; constraint gate covers the new batch") {
    val dir = fresh()
    val log = SnapshotLog(spark, dir, statsColumns = Seq("id"))
    log.append((0 until 6).map(i => (i.toLong, i * 10L)).toDF("id", "qty")
      .coalesce(1))
    log.deleteKeys("id", Seq(3L).toDF("id"))
    assertThrows[IllegalArgumentException](
      log.overwriteWhere(Seq(("id", 0L, 2L)), Seq((9L, 9L)).toDF("id", "qty")))
    log.compact()
    log.addConstraint("qty_pos", "qty >= 0")
    val ex = intercept[Exception] {
      log.overwriteWhere(Seq(("id", 0L, 2L)),
        Seq((9L, -1L)).toDF("id", "qty"))
    }
    assert(ex.getMessage.contains("qty_pos"), ex.getMessage)
    assert(log.read().where(col("qty") < 0).count() == 0,
      "a violating batch must abort the WHOLE swap")
    log.overwriteWhere(Seq(("id", 0L, 2L)), Seq((9L, 9L)).toDF("id", "qty"))
    assert(log.read().count() == 3) // 4, 5 survive (3 tombstoned) + the batch
  }
}
