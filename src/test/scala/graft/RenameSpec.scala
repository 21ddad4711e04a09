package graft

import graft.table.{PartitionField, SnapshotLog}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Field-id column renames ([[SnapshotLog.renameColumn]]): metadata-only
  * commit, old files keep resolving by stable id across the boundary —
  * reads, stats/bloom pruning, deletes, merges, the change feed, time
  * travel, mirrors and the SQL surfaces all stay exact. */
class RenameSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-ren-").resolve("t").toString

  test("rename is metadata-only; reads span the boundary; time travel is exact") {
    val log = SnapshotLog(spark, freshTable(), statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1)) // v1
    val preRename = log.currentVersion()
    val before = log.snapshot()
    val s = log.renameColumn("v", "payload")                                   // v2
    assert(s.op == "rename" && s.files == before.files,
      "a rename must not touch a single data file")
    assert(s.fileSchemaIdx.keySet == before.files.toSet,
      "every live file pins to the epoch that wrote it")
    // post-rename append under the NEW name: two epochs coexist
    log.append((10 until 20).map(i => (i, s"b$i")).toDF("id", "payload")
      .coalesce(1))                                                            // v3
    val got = log.read().select("id", "payload").as[(Int, String)]
      .collect().toSeq.sorted
    assert(got == ((0 until 10).map(i => (i, s"a$i")) ++
      (10 until 20).map(i => (i, s"b$i"))),
      "old-epoch files must resolve the renamed column by field id")
    // time travel: the pre-rename version reads under its OWN name
    assert(log.read(preRename).columns.toSeq == Seq("id", "v"))
    assert(log.read().columns.toSeq == Seq("id", "payload"))
  }

  test("chained renames compose; widening stays unchanged across them") {
    val log = SnapshotLog(spark, freshTable())
    log.append(Seq((1, "x")).toDF("id", "v").coalesce(1))
    log.renameColumn("v", "w")
    log.renameColumn("w", "payload")
    log.renameColumn("id", "key")
    // widen AFTER the renames: new nullable column appends, old rows null
    log.append(Seq((2, "y", 9L)).toDF("key", "payload", "extra"))
    val got = log.read().select("key", "payload", "extra")
      .as[(Int, String, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "x", None), (2, "y", Some(9L))),
      "two epochs + a widen must all align by id")
    // widening-only rule unchanged: a type change still aborts
    assertThrows[IllegalStateException](
      log.append(Seq(("no", "t", 1L)).toDF("key", "payload", "extra")))
  }

  test("stats pruning and predicate deletes translate through write-time names") {
    val log = SnapshotLog(spark, freshTable(), statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1))
    log.append((1000 until 1010).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1))
    log.renameColumn("id", "doc_id")
    // pruning on the NEW name must reach old files' stats (recorded
    // under 'id') — 1-of-2 files opened
    assert(log.filesMatching(Seq(("doc_id", 1000, 1009))).size == 1,
      "old-epoch stats must translate, not degrade to keep-all")
    val r = log.readBetween("doc_id", 1000, 1004)
    assert(r.select("doc_id").as[Int].collect().sorted.toSeq ==
      (1000 to 1004))
    // delete on the new name: metadata drop of the fully-matched old file
    val d = log.deleteWhere(("doc_id", 1000, 1009)).get
    assert(d.rows == 10 && d.changes.isEmpty)
    assert(log.read().select("doc_id").as[Int].collect().sorted.toSeq ==
      (0 until 10))
    // merge by the new key against an old-epoch file
    val m = log.mergeByKey(Seq((5, "upd"), (77, "new"))
      .toDF("doc_id", "v2").withColumnRenamed("v2", "v"), "doc_id")
    assert(m.rows == 11)
    val vals = log.read().where(col("doc_id").isin(5, 77))
      .select("v").as[String].collect().toSet
    assert(vals == Set("upd", "new"))
  }

  test("compaction materializes the rename; SQL surfaces field-id-align until it does") {
    val root = Files.createTempDirectory("graft-ren-sql-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    log.append((0 until 5).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1))
    log.renameColumn("v", "payload")
    // catalog: the debt scan resolves pre-rename files BY FIELD ID —
    // renamed values surface under the new name, never as nulls
    spark.conf.set("spark.sql.catalog.grent",
      classOf[graft.table.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.grent.root", root)
    assert(spark.sql("SELECT count(*) FROM grent.t1").head().getLong(0) == 5)
    assert(spark.sql(
      "SELECT count(*) FROM grent.t1 WHERE payload IS NOT NULL")
      .head().getLong(0) == 5, "pre-rename values must alias, not null")
    // the TVF rides the same debt-aware scan — exact NOW
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    assert(s.sql(s"SELECT sum(id) AS n FROM graft_log('$root/t1')")
      .head().getLong(0) == 10)
    // compact() re-stages under current names and clears the debt
    val c = log.compact(targetFileBytes = Long.MaxValue).get
    assert(c.fileSchemaIdx.isEmpty)
    assert(spark.sql("SELECT count(*) FROM grent.t1").head().getLong(0) == 5)
    assert(spark.sql("SELECT sum(id) FROM grent.t1 WHERE payload = 'a3'")
      .head().getLong(0) == 3)
  }

  test("change feed aligns across the rename boundary; mirror replays it") {
    val src = SnapshotLog.withChangeFeed(spark, freshTable(),
      statsColumns = Seq("id"))
    src.append((0 until 5).map(i => (i, s"a$i")).toDF("id", "v"))      // v1
    src.renameColumn("v", "payload")                                    // v2
    src.append((5 until 8).map(i => (i, s"b$i")).toDF("id", "payload")) // v3
    src.deleteWhere(("id", 1, 1))                                       // v4
    // one feed across the boundary: ONE column under the CURRENT name
    val feed = src.readChangeRows(0)
    assert(feed.columns.contains("payload") && !feed.columns.contains("v"))
    val ins = feed.where(col("_change_type") === "insert")
      .select("id", "payload").as[(Int, String)].collect().toSeq.sorted
    assert(ins == ((0 until 5).map(i => (i, s"a$i")) ++
      (5 until 8).map(i => (i, s"b$i"))),
      "pre-rename inserts must surface under the renamed column, not null")
    // mirror: replays append + rename + append + delete; rerun converges
    val dst = SnapshotLog(spark, freshTable())
    graft.table.LogMirror.mirror(src, dst)
    assert(dst.read().columns.toSeq.sorted == Seq("id", "payload"))
    assert(dst.read().select("id", "payload").as[(Int, String)]
      .collect().toSeq.sorted ==
      src.read().select("id", "payload").as[(Int, String)]
        .collect().toSeq.sorted)
    graft.table.LogMirror.mirror(src, dst) // idempotent re-walk
    assert(dst.read().count() == 7)
  }

  test("refusals: partition sources, pending tombstone keys, name collisions") {
    val dir = freshTable()
    val log = SnapshotLog.partitioned(spark, dir,
      Seq(PartitionField.identity("grp")), statsColumns = Seq("id"))
    log.append((0 until 6).map(i => (i, (i % 2).toLong, s"r$i"))
      .toDF("id", "grp", "payload"))
    assertThrows[IllegalArgumentException](log.renameColumn("grp", "bucket"))
    assertThrows[IllegalArgumentException](log.renameColumn("id", "payload"))
    assertThrows[IllegalArgumentException](log.renameColumn("nope", "x"))
    log.deleteKeys("id", Seq(3).toDF("id"))
    assertThrows[IllegalArgumentException](log.renameColumn("id", "doc_id"))
    log.compact() // materialize the tombstone
    val s = log.renameColumn("id", "doc_id") // now fine
    assert(s.op == "rename")
    assert(log.read().select("doc_id").as[Int].collect().sorted.toSeq ==
      Seq(0, 1, 2, 4, 5))
  }

  test("materializeRenames rewrites ONLY old-epoch files; vectored files defer") {
    val log = SnapshotLog(spark, freshTable(), statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1))
    log.append((100 until 110).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1))
    log.renameColumn("v", "payload")
    log.append((200 until 210).map(i => (i, s"c$i"))
      .toDF("id", "payload").coalesce(1)) // current-epoch, must carry
    log.deleteBetween("id", 100, 100) // vector on one OLD-epoch file
    val before = log.snapshot()
    val currentEpochFile = before.files.filterNot(before.fileSchemaIdx.contains)
    val vectored = before.dvs.keySet
    assert(vectored.size == 1 && before.fileSchemaIdx.size == 2)
    val s = log.materializeRenames().get
    assert(currentEpochFile.forall(s.files.contains),
      "current-epoch files must carry BY NAME")
    assert(vectored.forall(s.files.contains) && s.dvs == before.dvs,
      "the vectored old-epoch file defers to materializeDeletes")
    assert(s.fileSchemaIdx.keySet == vectored,
      "only the vectored file's rename debt may remain")
    assert(s.rows == before.rows)
    // the second targeted pass clears the rest
    assert(log.materializeDeletes().isDefined)
    val fin = log.snapshot()
    assert(fin.dvs.isEmpty && fin.fileSchemaIdx.isEmpty)
    assert(log.read().select("id").as[Int].collect().sorted.toSeq ==
      ((0 until 10) ++ (101 until 110) ++ (200 until 210)))
    assert(log.materializeRenames().isEmpty, "no-op when nothing pends")
  }

  test("declared sort order follows the rename for subsequent stages") {
    val log = SnapshotLog.sorted(spark, freshTable(), sortBy = Seq("id"),
      statsColumns = Seq("id"))
    log.append((0 until 20).reverse.map(i => (i, s"a$i")).toDF("id", "v"))
    val s = log.renameColumn("id", "key")
    assert(s.sortOrder == Seq("key"))
    // a post-rename append still stages sorted (and stats still lift,
    // via the handle's retargeted column set)
    val s2 = log.append((20 until 40).reverse.map(i => (i, s"b$i"))
      .toDF("key", "v").coalesce(1))
    val newFile = (s2.files.toSet -- s.files).head
    assert(s2.stats.get(newFile).exists(_.contains("key")),
      "the handle must lift stats under the NEW name after its own rename")
  }

  test("nested evolution: rename/drop/add inside a struct is metadata-only across the epoch boundary") {
    val dir = freshTable()
    val log = SnapshotLog(spark, dir, statsColumns = Seq("id"))
    val mkRow = (i: Int) => (i, (s"u$i", i * 1.5, s"c$i"))
    log.append((0 until 5).map(mkRow)
      .toDF("id", "meta").coalesce(1)) // v1: meta = struct(_1, _2, _3)
    // name the inner fields via a typed schema instead of _1/_2/_3
    val dir2 = freshTable()
    val log2 = SnapshotLog(spark, dir2, statsColumns = Seq("id"))
    log2.append(spark.sql(
      """SELECT id, named_struct('user', concat('u', id), 'score', CAST(id * 1.5 AS DOUBLE),
        |  'city', concat('c', id)) AS meta
        |FROM range(5)""".stripMargin).coalesce(1))                   // v1
    val r = log2.renameColumn("meta.user", "handle")                  // v2
    assert(r.op == "rename" && r.fileSchemaIdx.nonEmpty,
      "a nested rename pins old files to their epoch")
    log2.dropColumn("meta.city")                                      // v3
    log2.addColumn("meta.tier", org.apache.spark.sql.types.IntegerType) // v4
    // old files read across the boundary BY PER-LEVEL FIELD ID:
    // renamed values alias, dropped stop being selected, added is NULL
    val out = log2.read().selectExpr("id", "meta.handle", "meta.score",
      "meta.tier").collect().map(x =>
      (x.getLong(0), x.getString(1), x.getDouble(2),
        if (x.isNullAt(3)) -1 else x.getInt(3))).sortBy(_._1)
    assert(out.toSeq == (0L until 5L).map(i =>
      (i, s"u$i", i * 1.5, -1)), out.mkString(", "))
    assert(!log2.read().schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("city"))
    // a post-evolution append under the NEW shape lands and reads whole
    log2.append(spark.sql(
      """SELECT CAST(100 AS BIGINT) AS id,
        |  named_struct('handle', 'u100', 'score', CAST(9.0 AS DOUBLE),
        |    'tier', 3) AS meta""".stripMargin))                      // v5
    assert(log2.read().where(col("id") === 100)
      .selectExpr("meta.tier").head().getInt(0) == 3)
    assert(log2.read().count() == 6)
    // maintenance drains the nested debt; reads unchanged
    val drained = log2.materializeRenames().get
    assert(drained.fileSchemaIdx.isEmpty)
    assert(log2.read().selectExpr("sum(meta.score)").head().getDouble(0) ==
      (0 until 5).map(_ * 1.5).sum + 9.0)
    // guards: intermediate non-struct, missing leaf, collision,
    // drop-the-last-field
    assertThrows[UnsupportedOperationException](
      log2.renameColumn("id.x", "y"))
    assertThrows[IllegalArgumentException](
      log2.renameColumn("meta.nope", "y"))
    assertThrows[IllegalArgumentException](
      log2.renameColumn("meta.score", "HANDLE"))
    val dir3 = freshTable()
    val log3 = SnapshotLog(spark, dir3)
    log3.append(spark.sql(
      "SELECT 1 AS id, named_struct('only', 'x') AS s").coalesce(1))
    assertThrows[IllegalArgumentException](log3.dropColumn("s.only"))
  }

  test("element evolution: rename/drop/add inside array<struct> across the epoch boundary") {
    val dir = freshTable()
    val log = SnapshotLog(spark, dir, statsColumns = Seq("id"))
    log.append(spark.sql(
      """SELECT id, array(
        |  named_struct('kind', concat('k', id), 'val', CAST(id AS DOUBLE),
        |    'extra', 'junk'),
        |  named_struct('kind', 'fixed', 'val', CAST(id * 2 AS DOUBLE),
        |    'extra', 'junk2')) AS events
        |FROM range(4)""".stripMargin).coalesce(1))                   // v1
    val r = log.renameColumn("events.element.kind", "type")           // v2
    assert(r.op == "rename" && r.fileSchemaIdx.nonEmpty,
      "an element rename pins old files to their epoch")
    log.dropColumn("events.element.extra")                            // v3
    log.addColumn("events.element.w", org.apache.spark.sql.types.IntegerType) // v4
    // old files align per ELEMENT by per-level field id
    val out = log.read().selectExpr("id",
      "events[0].type", "events[0].val", "events[0].w").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2),
        x.isNullAt(3))).sortBy(_._1)
    assert(out.toSeq == (0L until 4L).map(i => (i, s"k$i", i.toDouble, true)),
      out.mkString(", "))
    assert(!log.read().schema("events").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("extra"))
    // post-evolution append under the NEW element shape
    log.append(spark.sql(
      """SELECT CAST(100 AS BIGINT) AS id, array(
        |  named_struct('type', 'new', 'val', CAST(9.0 AS DOUBLE), 'w', 7))
        |  AS events""".stripMargin))                                 // v5
    val whole = log.read().selectExpr("explode(events) AS e")
      .selectExpr("e.type", "e.val", "e.w")
    assert(whole.count() == 9 &&
      whole.where(col("w").isNotNull).count() == 1)
    // time travel: pre-evolution version reads under its OWN element names
    assert(log.read(1).selectExpr("events[0].kind").count() == 4)
    // maintenance drains the element debt; totals unchanged
    val drained = log.materializeRenames().get
    assert(drained.fileSchemaIdx.isEmpty)
    assert(log.read().selectExpr("aggregate(events, CAST(0.0 AS DOUBLE), " +
      "(a, e) -> a + e.val)").as[Double].collect().sum ==
      (0 until 4).map(i => i + i * 2.0).sum + 9.0)
  }

  test("element evolution: map values evolve; map keys refuse") {
    val log = SnapshotLog(spark, freshTable(), statsColumns = Seq("id"))
    log.append(spark.sql(
      """SELECT id, map('m', named_struct('a', concat('a', id), 'b', id * 10))
        |  AS props
        |FROM range(3)""".stripMargin).coalesce(1))                   // v1
    log.renameColumn("props.value.a", "x")                            // v2
    log.dropColumn("props.value.b")                                   // v3
    log.addColumn("props.value.c", org.apache.spark.sql.types.LongType) // v4
    val out = log.read().selectExpr("id", "props['m'].x", "props['m'].c")
      .collect().map(x => (x.getLong(0), x.getString(1), x.isNullAt(2)))
      .sortBy(_._1)
    assert(out.toSeq == (0L until 3L).map(i => (i, s"a$i", true)),
      out.mkString(", "))
    // new-shape append + drain
    log.append(spark.sql(
      """SELECT CAST(50 AS BIGINT) AS id,
        |  map('m', named_struct('x', 'fresh', 'c', CAST(5 AS BIGINT)))
        |  AS props""".stripMargin))                                  // v5
    assert(log.materializeRenames().get.fileSchemaIdx.isEmpty)
    assert(log.read().selectExpr("props['m'].x").as[String]
      .collect().sorted.toSeq == Seq("a0", "a1", "a2", "fresh"))
    // refusals: key evolution, wrong pseudo-segment spelling
    assertThrows[UnsupportedOperationException](
      log.renameColumn("props.key.k", "j"))
    assertThrows[UnsupportedOperationException](
      log.renameColumn("props.a", "j"))
  }

  test("nested evolution: SQL ALTER TABLE spellings route; mirror replays the nested verbs") {
    val root = java.nio.file.Files.createTempDirectory("graft-ren-nest-sql-")
      .toString
    val log = SnapshotLog(spark, s"$root/t", statsColumns = Seq("id"))
    log.append(spark.sql(
      """SELECT id, named_struct('user', concat('u', id), 'score', CAST(id * 1.5 AS DOUBLE))
        |  AS meta
        |FROM range(4)""".stripMargin).coalesce(1))
    spark.conf.set("spark.sql.catalog.gnest",
      classOf[graft.table.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnest.root", root)
    spark.sql("ALTER TABLE gnest.t RENAME COLUMN meta.user TO handle")
    spark.sql("ALTER TABLE gnest.t ADD COLUMN meta.tier INT")
    assert(spark.sql(
      "SELECT count(meta.handle) FROM gnest.t").head().getLong(0) == 4,
      "the debt scan aliases the renamed nested field for old files")
    spark.sql("ALTER TABLE gnest.t DROP COLUMN meta.score")
    assert(spark.sql("SELECT * FROM gnest.t").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("handle", "tier"))
    // mirror: nested rename/drop/widen replay on a replica seeded pre-evolution
    val src = SnapshotLog(spark, s"$root/t")
    val dst = SnapshotLog(spark, freshTable())
    graft.table.LogMirror.mirror(src, dst)
    assert(dst.read().schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("handle", "tier"))
    assert(dst.read().selectExpr("meta.handle").as[String]
      .collect().sorted.toSeq == (0 until 4).map(i => s"u$i"))
    graft.table.LogMirror.mirror(src, dst) // idempotent re-walk
    assert(dst.read().count() == 4)
  }

  test("element evolution: SQL ALTER spellings (a.element.x) route; the debt scan aligns") {
    val root = java.nio.file.Files.createTempDirectory("graft-ren-elem-sql-")
      .toString
    val log = SnapshotLog(spark, s"$root/t", statsColumns = Seq("id"))
    log.append(spark.sql(
      """SELECT id, array(named_struct('kind', concat('k', id),
        |  'val', CAST(id AS DOUBLE))) AS evs
        |FROM range(4)""".stripMargin).coalesce(1))
    graft.ops.Relational.withConfs(spark,
      "spark.sql.catalog.gelem" -> classOf[graft.table.GraftTableCatalog].getName,
      "spark.sql.catalog.gelem.root" -> root) {
      spark.sql("ALTER TABLE gelem.t RENAME COLUMN evs.element.kind TO type")
      spark.sql("ALTER TABLE gelem.t ADD COLUMN evs.element.w INT")
      // debt scan: old files alias the renamed element field by id and
      // read the added one as NULL — through plain SQL
      val got = spark.sql(
        """SELECT e.type, e.val, e.w
          |FROM (SELECT explode(evs) AS e FROM gelem.t)
          |ORDER BY e.val""".stripMargin).collect()
        .map(x => (x.getString(0), x.getDouble(1), x.isNullAt(2)))
      assert(got.toSeq == (0 until 4).map(i => (s"k$i", i.toDouble, true)),
        got.mkString(", "))
      spark.sql("ALTER TABLE gelem.t DROP COLUMN evs.element.val")
      assert(spark.sql("SELECT * FROM gelem.t").schema("evs").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq == Seq("type", "w"))
      // post-evolution INSERT under the new element shape + read back
      spark.sql("INSERT INTO gelem.t VALUES " +
        "(100, array(named_struct('type', 'new', 'w', 7)))")
      assert(spark.sql(
        "SELECT count(*) FROM gelem.t WHERE evs[0].w IS NOT NULL")
        .head().getLong(0) == 1)
      assert(spark.sql("SELECT count(evs[0].type) FROM gelem.t")
        .head().getLong(0) == 5)
    }
  }
}
