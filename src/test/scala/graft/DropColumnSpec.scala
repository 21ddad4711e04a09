package graft

import graft.table.{GraftTableCatalog, LogMirror, PartitionField, SnapshotLog}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Field-id column drops and explicit widens ([[SnapshotLog.dropColumn]]
  * / [[SnapshotLog.addColumn]]): metadata-only commits on the rename
  * machinery — old files stop projecting the dropped field by stable id,
  * a re-added name gets a FRESH id so retired values never resurrect,
  * and the `ALTER TABLE` SQL verbs route through the same commits. */
class DropColumnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-drop-").resolve("t").toString

  test("drop is metadata-only; reads project it away; time travel keeps the old schema") {
    val log = SnapshotLog(spark, freshTable(), statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i, s"a$i", i * 2L))
      .toDF("id", "v", "extra").coalesce(1))                       // v1
    val preDrop = log.currentVersion()
    val before = log.snapshot()
    val s = log.dropColumn("extra")                                // v2
    assert(s.op == "drop" && s.files == before.files,
      "a drop must not touch a single data file")
    assert(s.fileSchemaIdx.keySet == before.files.toSet)
    assert(log.read().columns.toSeq == Seq("id", "v"))
    // post-drop append: two epochs coexist, both read under the new schema
    log.append((10 until 20).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1))
    assert(log.read().select("id", "v").as[(Int, String)].collect()
      .toSeq.sorted == ((0 until 10).map(i => (i, s"a$i")) ++
        (10 until 20).map(i => (i, s"b$i"))))
    // time travel: the pre-drop version still reads the column
    assert(log.read(preDrop).columns.toSeq == Seq("id", "v", "extra"))
    assert(log.read(preDrop).where(col("id") === 3).select("extra")
      .as[Long].head() == 6L)
  }

  test("drop then re-add the same name: a FRESH field id — old values never resurrect") {
    val log = SnapshotLog(spark, freshTable())
    log.append((0 until 5).map(i => (i, s"secret$i")).toDF("id", "note")
      .coalesce(1))                                                // v1
    log.dropColumn("note")                                         // v2
    // re-add by widened append (the implicit path)
    log.append(Seq((100, "fresh")).toDF("id", "note").coalesce(1)) // v3
    val got = log.read().as[(Int, Option[String])].collect().toSeq.sortBy(_._1)
    assert(got == (0 until 5).map(i => (i, None)) :+ ((100, Some("fresh"))),
      "pre-drop files must read the re-added column as NULL, not the " +
        "retired physical values")
    // and once more through the EXPLICIT widen verb
    log.dropColumn("note")
    log.addColumn("note", org.apache.spark.sql.types.StringType)
    val again = log.read().as[(Int, Option[String])].collect().toSeq.sortBy(_._1)
    assert(again.forall(_._2.isEmpty),
      "a widen-re-added name reads NULL everywhere until a writer ships it")
  }

  test("addColumn is a metadata-only widen: old rows NULL, new appends carry it") {
    val log = SnapshotLog(spark, freshTable())
    log.append(Seq((1, "x")).toDF("id", "v").coalesce(1))          // v1
    val before = log.snapshot()
    val s = log.addColumn("score", org.apache.spark.sql.types.LongType) // v2
    assert(s.op == "widen" && s.files == before.files && s.rows == before.rows)
    assert(s.fileSchemaIdx.isEmpty,
      "a widen needs no epoch tags — absence from a footer reads NULL")
    assert(log.read().columns.toSeq == Seq("id", "v", "score"))
    log.append(Seq((2, "y", 9L)).toDF("id", "v", "score"))
    assert(log.read().as[(Int, String, Option[Long])].collect().toSeq
      .sortBy(_._1) == Seq((1, "x", None), (2, "y", Some(9L))))
    assertThrows[IllegalArgumentException](log.addColumn("ID",
      org.apache.spark.sql.types.IntegerType)) // case-insensitive dup
  }

  test("maintenance drains drop debt; the DSv2 scan epoch-aligns until it does") {
    val root = Files.createTempDirectory("graft-drop-sql-").toString
    val log = SnapshotLog(spark, s"$root/t", statsColumns = Seq("id"))
    log.append((0 until 8).map(i => (i, s"a$i", i.toString))
      .toDF("id", "v", "junk").coalesce(1))
    log.dropColumn("junk")
    spark.conf.set("spark.sql.catalog.gdrop", classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdrop.root", root)
    // the debt scan serves the dropped shape during the window — the
    // dropped column is gone, the survivors are intact
    val during = spark.sql("SELECT * FROM gdrop.t ORDER BY id")
    assert(during.columns.toSeq == Seq("id", "v"))
    assert(during.count() == 8)
    val drained = log.materializeRenames().get
    assert(drained.fileSchemaIdx.isEmpty)
    assert(spark.sql("SELECT count(*) FROM gdrop.t").head().getLong(0) == 8)
    // the rewrite physically shed the column
    val files = drained.files.map(f => new org.apache.hadoop.fs.Path(
      s"$root/t/data", f).toString)
    assert(!spark.read.parquet(files: _*).columns.contains("junk"))
  }

  test("ALTER TABLE SQL verbs: RENAME, DROP, ADD; refusals stay loud") {
    val root = Files.createTempDirectory("graft-drop-alter-").toString
    val log = SnapshotLog(spark, s"$root/t")
    log.append(Seq((1L, "x", 2.0)).toDF("id", "v", "junk").coalesce(1))
    spark.conf.set("spark.sql.catalog.galt", classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.galt.root", root)
    spark.sql("ALTER TABLE galt.t RENAME COLUMN v TO payload")
    spark.sql("ALTER TABLE galt.t DROP COLUMN junk")
    spark.sql("ALTER TABLE galt.t ADD COLUMN score BIGINT")
    val s = SnapshotLog(spark, s"$root/t")
    assert(s.read().columns.toSeq == Seq("id", "payload", "score"))
    assert(s.currentVersion() == 4L, "three metadata-only commits")
    // a type change is refused — the log stays widening-only
    assertThrows[Exception](
      spark.sql("ALTER TABLE galt.t ALTER COLUMN id TYPE STRING"))
    assertThrows[Exception](
      spark.sql("ALTER TABLE galt.t DROP COLUMN nope"))
    spark.sql("ALTER TABLE galt.t DROP COLUMN IF EXISTS nope") // no-op
    assert(SnapshotLog(spark, s"$root/t").currentVersion() == 4L)
  }

  test("ALTER COLUMN TYPE: lossless widen is metadata-only; old files read cast-up; time travel intact") {
    val root = Files.createTempDirectory("graft-widen-type-").toString
    spark.conf.set("spark.sql.catalog.gwt", classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwt.root", root)
    spark.sql("CREATE TABLE gwt.t (id INT, score FLOAT, v STRING)")
    spark.sql("INSERT INTO gwt.t VALUES (1, CAST(1.5 AS FLOAT), 'a'), " +
      "(2, CAST(2.5 AS FLOAT), 'b')")
    val preWiden = SnapshotLog(spark, s"$root/t").currentVersion()
    spark.sql("ALTER TABLE gwt.t ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE gwt.t ALTER COLUMN score TYPE DOUBLE")
    val log = SnapshotLog(spark, s"$root/t")
    assert(log.currentVersion() == preWiden + 2 &&
      log.snapshot().op == "widen_type", "two metadata-only commits")
    // old files (written narrow) read under the WIDENED schema
    val widened = spark.sql("SELECT id, score, v FROM gwt.t ORDER BY id")
    assert(widened.schema("id").dataType.typeName == "long" &&
      widened.schema("score").dataType.typeName == "double")
    assert(widened.as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 1.5d, "a"), (2L, 2.5d, "b")))
    // new writes land wide and mix with old files in one scan
    spark.sql("INSERT INTO gwt.t VALUES (3000000000, 3.5, 'c')")
    assert(spark.sql("SELECT sum(id) FROM gwt.t").head().getLong(0) ==
      3000000003L, "a value past Int.MaxValue must land after the widen")
    // stats pruning still works over narrow-written files (bound
    // strings re-parse under the widened type)
    assert(spark.sql("SELECT v FROM gwt.t WHERE id = 2").head().getString(0) == "b")
    // time travel BEFORE the widen reads the narrow type
    val tt = spark.sql(s"SELECT id FROM gwt.t VERSION AS OF $preWiden")
    assert(tt.schema("id").dataType.typeName == "integer")
    // non-widening changes refuse
    assertThrows[Exception](
      spark.sql("ALTER TABLE gwt.t ALTER COLUMN id TYPE INT")) // narrow
    assertThrows[Exception](
      spark.sql("ALTER TABLE gwt.t ALTER COLUMN v TYPE BIGINT")) // string
    // a bucket-source column refuses (tuples hashed over the narrow type)
    val bl = SnapshotLog.partitioned(spark, freshTable(),
      Seq(PartitionField.bucket("k", 4)))
    bl.append(Seq((1, "x")).toDF("k", "v").coalesce(1))
    assertThrows[IllegalArgumentException](
      bl.widenColumnType("k", org.apache.spark.sql.types.LongType))
    // maintenance drains the widen epochs: compaction rewrites under
    // the CURRENT schema, files untag, and the catalog returns to the
    // vectorized scan
    val wlog = SnapshotLog(spark, s"$root/t")
    wlog.compact()
    val drained = wlog.snapshot()
    assert(drained.fileSchemaIdx.isEmpty,
      "compaction must materialize the widen epochs away")
    val scan = new graft.table.LogScanBuilder(wlog, wlog.currentVersion(),
      wlog.read().schema).build()
    assert(scan.isInstanceOf[graft.table.LogBatchScan],
      "a drained table plans the vectorized scan again")
    assert(spark.sql("SELECT sum(id) FROM gwt.t").head().getLong(0) ==
      3000000003L, "the compacted wide values read back exactly")
  }

  test("the mirror replays a widen_type commit; reruns converge") {
    val src = SnapshotLog(spark, freshTable())
    src.append(Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1))
    val dst = SnapshotLog(spark, freshTable())
    LogMirror.mirror(src, dst)
    src.widenColumnType("k", org.apache.spark.sql.types.LongType)
    src.append(Seq((3000000000L, "c")).toDF("k", "v").coalesce(1))
    LogMirror.mirror(src, dst)
    val dstSchema = dst.read().schema
    assert(dstSchema("k").dataType.typeName == "long",
      "the replica must replay the widen before the wide append lands")
    assert(dst.read().as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3000000000L, "c")))
    LogMirror.mirror(src, dst) // idempotent re-walk
    assert(dst.read().count() == 3)
  }

  test("guards: partition sources, tombstoned keys, and the last column refuse") {
    val log = SnapshotLog.partitioned(spark, freshTable(),
      Seq(PartitionField.bucket("id", 4)))
    log.append((0 until 8).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    assertThrows[IllegalArgumentException](log.dropColumn("id"))
    log.deleteKeys("v", Seq("a1").toDF("v"))
    assertThrows[IllegalArgumentException](log.dropColumn("v"))
    val single = SnapshotLog(spark, freshTable())
    single.append(Seq(Tuple1(1)).toDF("only").coalesce(1))
    assertThrows[IllegalArgumentException](single.dropColumn("only"))
  }

  test("the change feed spans a drop boundary; the mirror replays drops and widens") {
    val srcDir = freshTable()
    val src = SnapshotLog.withChangeFeed(spark, srcDir)
    src.append((0 until 4).map(i => (i, s"a$i", i * 1.5))
      .toDF("id", "v", "extra").coalesce(1))                       // v1
    src.dropColumn("extra")                                        // v2
    src.addColumn("score", org.apache.spark.sql.types.LongType)    // v3
    src.append(Seq((9, "z", 7L)).toDF("id", "v", "score").coalesce(1)) // v4
    // feed across the boundary shapes under the TO-version schema
    val feed = src.readChangeRows(0)
    assert(feed.columns.toSeq ==
      Seq("id", "v", "score", "_change_type", "_commit_version"))
    assert(feed.count() == 5)
    // mirror: schema evolution replays metadata-only, rows converge
    val dst = SnapshotLog(spark, freshTable())
    LogMirror.mirror(src, dst)
    assert(dst.read().columns.toSeq == Seq("id", "v", "score"))
    assert(dst.read().as[(Int, String, Option[Long])].collect().toSeq.sorted ==
      src.read().as[(Int, String, Option[Long])].collect().toSeq.sorted)
    // idempotent under re-walk
    LogMirror.mirror(src, dst)
    assert(dst.read().count() == 5)
  }
}
