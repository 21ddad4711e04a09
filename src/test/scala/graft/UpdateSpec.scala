package graft

import graft.table.{DerivedAggregate, AggCol, GraftTableCatalog, LogMirror, SnapshotLog}
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Predicate UPDATE ([[SnapshotLog.updateWhere]] + the SQL
  * [[graft.table.UpdateLogRule]]): the three-arm planner (merge-on-read
  * DV + re-staged copies for sparse matches, copy-on-write for dense,
  * whole-file replacement for fully-matched files), old-row assignment
  * semantics, partition re-staging, CDC images + four-type retyping,
  * rollup folds, mirror replay, and the SQL surface's exact-condition
  * contract. */
class UpdateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-upd-").resolve("t").toString

  /** 4 files, ids clustered per file: f0 0-99 ... f3 300-399. */
  private def clustered(dir: String, feed: Boolean = false): SnapshotLog = {
    val log =
      if (feed) SnapshotLog.withChangeFeed(spark, dir, statsColumns = Seq("id"))
      else SnapshotLog(spark, dir, statsColumns = Seq("id"))
    (0 until 4).foreach { run =>
      log.append((0 until 100).map(i => (run * 100 + i, s"r$run-$i"))
        .toDF("id", "payload").coalesce(1))
    }
    assert(log.snapshot().files.size == 4)
    log
  }

  private def rows(log: SnapshotLog, v: Long = -1L): Map[Int, String] =
    log.read(v).as[(Int, String)].collect().toMap

  test("sparse update commits a vector + re-staged copies, no rewrite; dense update CoWs") {
    val log = clustered(freshTable())
    val before = log.snapshot()
    // 10 of f1's 100 rows (fraction 0.1 < DvRewriteFraction): the old
    // positions retire via a DV, the updated copies land as new files —
    // O(matched rows), f1's data file untouched
    val s1 = log.updateWhere(Seq(("id", 120, 129)),
      Seq("payload" -> lit("sparse"))).get
    assert(s1.op == "update" && s1.rows == 400)
    assert(before.files.forall(s1.files.contains),
      "a sparse update must keep every pre-update data file")
    assert(s1.dvs.size == 1, s"one vector on the one straddled file: ${s1.dvs}")
    val r1 = rows(log)
    assert((120 to 129).forall(r1(_) == "sparse"))
    assert(r1(119) == "r1-19" && r1(130) == "r1-30" && r1.size == 400)
    // 80 of f2's 100 rows (0.8 >= fraction): copy-on-write — f2 drops,
    // survivors + updated copies restage, no NEW vector appears
    val f2 = before.files(2)
    val s2 = log.updateWhere(Seq(("id", 200, 279)),
      Seq("payload" -> lit("dense"))).get
    assert(!s2.files.contains(f2), "a dense update must rewrite the file")
    assert(s2.dvs == s1.dvs, "the dense arm must not add vectors")
    assert(s2.rows == 400)
    val r2 = rows(log)
    assert((200 to 279).forall(r2(_) == "dense"))
    assert(r2(280) == "r2-80" && r2(120) == "sparse" && r2.size == 400)
    // fully-matched file: zero survivors — the file just drops
    val s3 = log.updateWhere(Seq(("id", 300, 399)),
      Seq("payload" -> lit("all"))).get
    assert(!s3.files.contains(before.files(3)))
    assert(rows(log)(350) == "all" && s3.rows == 400)
    // time travel: every pre-update version reads as committed
    assert(rows(log, before.version)(125) == "r1-25")
    assert(rows(log, s1.version)(125) == "sparse")
    assert(rows(log, s1.version)(250) == "r2-50")
  }

  test("assignments see the OLD row, cast to the column type; guards refuse bad shapes") {
    val dir = freshTable()
    val log = SnapshotLog(spark, dir, statsColumns = Seq("k"))
    log.append(Seq((1, 10, 100), (2, 20, 200), (3, 30, 300))
      .toDF("k", "a", "b").coalesce(1))
    // swap a and b: both right-hand sides must read the pre-update row
    log.updateWhere(Seq(("k", 1, 2)), Seq("a" -> col("b"), "b" -> col("a")))
    val out = log.read().as[(Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, 100, 10), (2, 200, 20), (3, 30, 300)))
    // a long literal casts onto the int column (widening-in, no schema change)
    log.updateWhere(Seq(("k", 3, 3)), Seq("a" -> lit(7L)))
    assert(log.read().where(col("k") === 3).select("a").as[Int].head() == 7)
    assert(log.snapshot().schemaJson ==
      log.snapshot(1L).schemaJson, "UPDATE never evolves the schema")
    // refusals / no-ops
    intercept[IllegalArgumentException] {
      log.updateWhere(Seq(("k", 1, 1)), Seq("nope" -> lit(1)))
    }
    intercept[IllegalArgumentException] {
      log.updateWhere(Seq(("k", 1, 1)), Nil)
    }
    intercept[IllegalArgumentException] {
      log.updateWhere(Nil, Seq("a" -> lit(1)))
    }
    assert(log.updateWhere(Seq(("k", 99, 100)), Seq("a" -> lit(1))).isEmpty,
      "no matching row is a provable no-op")
    val cur = log.currentVersion()
    // exactly-once: a replayed (appId, batchId) commits nothing
    assert(log.updateWhereTxn(Seq(("k", 1, 1)), Seq("a" -> lit(0)),
      Some(("lane", 1L))).isDefined)
    assert(log.updateWhereTxn(Seq(("k", 1, 1)), Seq("a" -> lit(-1)),
      Some(("lane", 1L))).isEmpty)
    assert(log.currentVersion() == cur + 1)
    assert(log.read().where(col("k") === 1).select("a").as[Int].head() == 0)
  }

  test("updating a partition-source column re-stages rows into their new partitions") {
    val dir = freshTable()
    val log = SnapshotLog.partitioned(spark, dir,
      Seq(graft.table.PartitionField.identity("bucketCol")),
      statsColumns = Seq("id"))
    log.append((0 until 100).map(i => (i, if (i < 50) "a" else "b", s"p$i"))
      .toDF("id", "bucketCol", "payload"))
    // move ids 40-49 from partition a to partition c
    log.updateWhere(Seq(("id", 40, 49)), Seq("bucketCol" -> lit("c")))
    val s = log.snapshot()
    // the updated rows' files carry the NEW partition tuple
    val cFiles = s.partitions.collect {
      case (f, Seq("c")) => f }.toSet
    assert(cFiles.nonEmpty, s"updated rows must land under the new tuple: ${s.partitions}")
    // partition-pruned reads stay exact on both sides of the move
    assert(log.readWhere(("bucketCol", "c", "c")).count() == 10)
    assert(log.readWhere(("bucketCol", "a", "a")).count() == 40)
    assert(log.read().count() == 100)
  }

  test("CDC: images net to the table, four-type re-types 1:1, rollup folds exactly") {
    val log = clustered(freshTable(), feed = true)
    val v0 = log.currentVersion()
    log.updateWhere(Seq(("id", 150, 249)), // straddles f1+f2, 50 rows each
      Seq("payload" -> concat(lit("u:"), col("payload"))))
    // two-type: 100 deletes + 100 inserts, and feed-net == table
    val feed = log.readChangeRows(0L)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("delete") == 100 && byType("insert") == 500)
    // four-type: the update pair re-types unconditionally — appends stay inserts
    val four = log.readChangeRows(v0, fourType = true)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(four == Map("update_preimage" -> 100L, "update_postimage" -> 100L))
    val post = four("update_postimage")
    assert(post == 100L)
    // pre-images carry old values, post-images new
    val pre170 = log.readChangeRows(v0, fourType = true)
      .where(col("id") === 170).orderBy(col("_change_type"))
      .select("_change_type", "payload").as[(String, String)].collect().toSeq
    assert(pre170 == Seq(("update_postimage", "u:r1-70"), ("update_preimage", "r1-70")))
    // incremental rollup over the update span == full recompute
    val derived = SnapshotLog(spark, freshTable())
    val agg = new DerivedAggregate(log, derived, "payload",
      Seq(AggCol("n", "count"), AggCol("s", "sum", "id")))
    agg.refresh()
    val got = derived.read().as[(String, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    val want = log.read().groupBy("payload")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("id").as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(got == want)
  }

  test("mirror replays an update from predicates + post-images; rerun is idempotent") {
    val src = clustered(freshTable(), feed = true)
    val dst = SnapshotLog(spark, freshTable(), statsColumns = Seq("id"))
    LogMirror.mirror(src, dst)
    src.updateWhere(Seq(("id", 42, 44)), Seq("payload" -> lit("upd")))
    src.updateWhere(Seq(("id", 100, 199)), Seq("payload" -> lit("whole")))
    LogMirror.mirror(src, dst)
    assert(rows(dst) == rows(src))
    assert(rows(dst)(43) == "upd" && rows(dst)(150) == "whole")
    // rerun: both update versions are behind the lane watermark — skipped
    val dv = dst.currentVersion()
    LogMirror.mirror(src, dst)
    assert(dst.currentVersion() == dv)
    // an update on a NON-feed source records no images → refusal, not silence
    val bare = clustered(freshTable())
    val dst2 = SnapshotLog(spark, freshTable())
    LogMirror.mirror(bare, dst2)
    bare.updateWhere(Seq(("id", 1, 2)), Seq("payload" -> lit("x")))
    val ex = intercept[IllegalStateException] { LogMirror.mirror(bare, dst2) }
    assert(ex.getMessage.contains("resync"))
  }

  test("SQL UPDATE routes through the log; inexact conditions refuse loudly") {
    val root = Files.createTempDirectory("graft-upd-sql-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v").coalesce(1))
    log.append((1000 until 1010).map(i => (i.toLong, s"b$i")).toDF("id", "v").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupd1"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    s.sql(s"UPDATE $cat.t1 SET v = concat(v, '!') WHERE id BETWEEN 1000 AND 1004")
    assert(log.snapshot().op == "update",
      "SQL UPDATE must land as one transactional update commit")
    // the SQL verb runs the full auto planner — a 5-of-10 match sits at
    // the CoW threshold and rewrites; a sparse one below would vector,
    // and the debt scan keeps the table SQL-readable either way
    val out = s.sql(s"SELECT id, v FROM $cat.t1 WHERE id >= 1000 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(out.take(5) == (1000L to 1004L).map(i => (i, s"b$i!")) &&
      out.drop(5) == (1005L until 1010L).map(i => (i, s"b$i")))
    assert(log.read().count() == 20)
    // point condition + expression over the old row: a 1-of-10 match
    // takes the merge-on-read arm (deletion vector + post-image append)
    // and the catalog's debt scan serves the SQL read exactly
    s.sql(s"UPDATE $cat.t1 SET v = upper(v) WHERE id = 3")
    assert(log.snapshot().dvs.nonEmpty,
      "a sparse SQL UPDATE must take the deletion-vector arm")
    assert(rowsOf(s, cat)(3L) == "A3")
    assert(rowsOf(s, cat).size == 20, "no row may duplicate or vanish")
    def refused(sql: String, frag: String): Unit = {
      val ex = intercept[Exception] { s.sql(sql) }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains(frag)), msgs(ex).mkString(" | "))
    }
    refused(s"UPDATE $cat.t1 SET v = 'x'", "WHERE")
    // an uncorrelated scalar subquery in the WHERE now materializes
    // (it was a refusal before the r14 subquery materializer)
    s.sql(s"UPDATE $cat.t1 SET v = 'top' WHERE id = (SELECT max(id) FROM " +
      s"$cat.t1)")
    assert(rowsOf(s, cat)(1009L) == "top",
      "the scalar-subquery point update must land on max(id)")
    refused(s"UPDATE $cat.t1 SET v = 'x' WHERE rand() > 2", "non-deterministic")
  }

  test("SQL UPDATE/DELETE general predicates: OR-trees and expressions hit the expr planner") {
    val root = Files.createTempDirectory("graft-upd-expr-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v").coalesce(1))
    log.append((1000 until 1010).map(i => (i.toLong, s"b$i")).toDF("id", "v").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdx"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // OR across both files: 1-of-10 per file is sparse — the expr
    // planner's auto mode takes the deletion-vector arm; the debt scan
    // keeps the table SQL-readable through the window
    s.sql(s"UPDATE $cat.t1 SET v = upper(v) WHERE id = 1 OR id = 1005")
    assert(log.snapshot().op == "update" && log.snapshot().dvs.nonEmpty,
      "a sparse OR-update must land one update commit through the DV arm")
    val m1 = rowsOf(s, cat)
    assert(m1(1L) == "A1" && m1(1005L) == "B1005" && m1.size == 20)
    assert(m1(2L) == "a2" && m1(1004L) == "b1004")
    // expression predicate with a range-convertible conjunct: the
    // conjunct prunes candidates (only the first file), the full
    // predicate decides the rows
    s.sql(s"UPDATE $cat.t1 SET v = concat(v, '?') " +
      s"WHERE v LIKE 'a%' AND id BETWEEN 0 AND 3")
    val m2 = rowsOf(s, cat)
    assert(m2(0L) == "a0?" && m2(2L) == "a2?" && m2(3L) == "a3?")
    assert(m2(1L) == "A1", "the earlier update's row no longer matches a%")
    assert(m2(4L) == "a4" && m2.size == 20)
    // general DELETE: arithmetic predicate — previously refused at the
    // V2 filter boundary, now exact through the counting planner
    s.sql(s"DELETE FROM $cat.t1 WHERE id % 2 = 1 AND id < 100")
    assert(log.snapshot().op == "delete")
    val m3 = rowsOf(s, cat)
    assert(!m3.contains(3L) && !m3.contains(5L) && !m3.contains(7L) &&
      !m3.contains(9L) && !m3.contains(1L))
    assert(m3.contains(0L) && m3.contains(2L) && m3.contains(1005L))
    assert(m3.size == 15)
    // exactly-one-pass row accounting survives both verbs
    assert(log.read().count() == 15)
    def refused(sql: String, frag: String): Unit = {
      val ex = intercept[Exception] { s.sql(sql) }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains(frag)), msgs(ex).mkString(" | "))
    }
    // uncorrelated IN-subquery: materialized to a literal key list at
    // execution, routed through the same counting planner (with the
    // key list's min/max as a pruning hint)
    s.sql(s"DELETE FROM $cat.t1 WHERE id IN (SELECT id FROM $cat.t1 " +
      "WHERE id > 1006)")
    val m4 = rowsOf(s, cat)
    assert(!m4.contains(1007L) && !m4.contains(1009L) &&
      m4.contains(1005L) && m4.size == 12,
      s"the IN-subquery delete must remove exactly ids > 1006: $m4")
    // correlated subqueries beyond key equality still refuse with the
    // contract named (equality-correlated forms decorrelate since r15)
    refused(s"DELETE FROM $cat.t1 t WHERE EXISTS (SELECT 1 FROM $cat.t1 " +
      "u WHERE u.id > t.id)", "subquery")
  }

  test("SQL UPDATE/DELETE with IN/NOT IN subqueries: 3-valued NOT IN, update arm, refusal past the cap") {
    val root = Files.createTempDirectory("graft-upd-subq-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v").coalesce(1))
    val keysDir = s"$root/keys"
    SnapshotLog(spark, keysDir).append(
      Seq((2L, "x"), (4L, "x")).toDF("kid", "tag").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdsq"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // UPDATE with an IN-subquery against ANOTHER table + a plain conjunct
    s.sql(s"UPDATE $cat.t1 SET v = upper(v) " +
      s"WHERE id IN (SELECT kid FROM $cat.keys) AND id >= 3")
    val m1 = rowsOf(s, cat)
    assert(m1(4L) == "A4" && m1(2L) == "a2" && m1(3L) == "a3",
      s"only ids in the key set AND >= 3 may update: $m1")
    // NOT IN over a null-free set deletes the complement
    s.sql(s"DELETE FROM $cat.t1 " +
      s"WHERE id NOT IN (SELECT kid FROM $cat.keys) AND id >= 8")
    assert(rowsOf(s, cat).size == 8 && !rowsOf(s, cat).contains(9L))
    // NOT IN against a set CONTAINING NULL matches nothing (SQL
    // 3-valued logic) — the delete is a no-op, not a full sweep
    val vPre = log.currentVersion()
    s.sql(s"DELETE FROM $cat.t1 WHERE id NOT IN " +
      s"(SELECT CASE WHEN kid = 2 THEN NULL ELSE kid END FROM $cat.keys)")
    assert(rowsOf(s, cat).size == 8 && log.currentVersion() == vPre,
      "NOT IN with a NULL key must delete nothing (and commit nothing)")
    // IN over an EMPTY set is likewise a no-op
    s.sql(s"DELETE FROM $cat.t1 WHERE id IN " +
      s"(SELECT kid FROM $cat.keys WHERE kid > 100)")
    assert(rowsOf(s, cat).size == 8 && log.currentVersion() == vPre)
    // UNCORRELATED SCALAR subqueries materialize — in the WHERE and in
    // the SET (both were refusals before the materializer)
    s.sql(s"UPDATE $cat.t1 SET v = concat(v, " +
      s"CAST((SELECT max(kid) FROM $cat.keys) AS STRING)) " +
      s"WHERE id >= (SELECT max(kid) FROM $cat.keys) + 3")
    val m2 = rowsOf(s, cat)
    assert(m2(7L) == "a74" && m2(6L) == "a6",
      s"scalar thresholds must materialize: $m2")
    // EXISTS (uncorrelated) folds to a constant; OR-nesting works too
    // (the materializer substitutes at any depth, not just conjuncts)
    s.sql(s"DELETE FROM $cat.t1 WHERE (id = 0 OR id IN " +
      s"(SELECT kid FROM $cat.keys WHERE kid = 2)) AND EXISTS " +
      s"(SELECT 1 FROM $cat.keys WHERE tag = 'x')")
    val m3 = rowsOf(s, cat)
    assert(!m3.contains(0L) && !m3.contains(2L) && m3.size == 6,
      s"the OR-nested IN + EXISTS delete must remove ids 0 and 2: $m3")
    // EXISTS over an empty set folds FALSE: provable no-op, no commit
    val vPre2 = log.currentVersion()
    s.sql(s"DELETE FROM $cat.t1 WHERE EXISTS " +
      s"(SELECT 1 FROM $cat.keys WHERE kid > 100)")
    assert(rowsOf(s, cat).size == 6 && log.currentVersion() == vPre2)
  }

  test("correlated EXISTS/NOT EXISTS DML decorrelates on a pure key equality; impure correlation refuses") {
    val root = Files.createTempDirectory("graft-upd-corr-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    log.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .coalesce(1))
    SnapshotLog(spark, s"$root/gdpr").append(
      Seq((2L, "erase"), (4L, "erase"), (7L, "keep"))
        .toDF("uid", "why").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdcorr"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // the GDPR-by-join spelling: correlated EXISTS on a pure key
    // equality + an inner-only conjunct — decorrelates to the
    // materialized key list {2, 4}
    s.sql(s"DELETE FROM $cat.t1 t WHERE EXISTS " +
      s"(SELECT 1 FROM $cat.gdpr g WHERE g.uid = t.id AND g.why = 'erase')")
    val m1 = rowsOf(s, cat)
    assert(!m1.contains(2L) && !m1.contains(4L) && m1.contains(7L) &&
      m1.size == 8, s"EXISTS-by-key must delete exactly ids 2 and 4: $m1")
    // NOT EXISTS updates the complement — the coalesce(…, false) form
    // keeps EXISTS's 2-valued truth table, so negation is exact
    s.sql(s"UPDATE $cat.t1 t SET v = upper(v) WHERE NOT EXISTS " +
      s"(SELECT 1 FROM $cat.gdpr g WHERE g.uid = t.id) AND t.id <= 3")
    val m2 = rowsOf(s, cat)
    assert(m2(0L) == "A0" && m2(1L) == "A1" && m2(3L) == "A3" &&
      m2(7L) == "a7", s"NOT EXISTS must update the un-keyed ids <= 3: $m2")
    // NULL inner keys never witness an EXISTS; NOT EXISTS over them
    // still matches every row (the IsNotNull inner filter, not NOT IN's
    // 3-valued collapse)
    s.sql(s"DELETE FROM $cat.t1 t WHERE EXISTS (SELECT 1 FROM " +
      s"$cat.gdpr g WHERE CASE WHEN g.why = 'keep' THEN NULL ELSE g.uid " +
      "END = t.id AND g.uid > 5)")
    assert(rowsOf(s, cat).size == 8,
      "a NULL-keyed inner row must witness nothing")
    def refused(sql: String, frag: String): Unit = {
      val ex = intercept[Exception] { s.sql(sql) }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains(frag)), msgs(ex).mkString(" | "))
    }
    // expression-over-outer correlation decorrelates too (the computed
    // key becomes the row-IN's left value): uid = id + 1 hits ids 1, 3
    // and 6 (uids 2, 4, 7) among the 8 survivors
    s.sql(s"UPDATE $cat.t1 t SET v = concat(v, '+') WHERE EXISTS " +
      s"(SELECT 1 FROM $cat.gdpr g WHERE g.uid = t.id + 1)")
    val m3 = rowsOf(s, cat)
    assert(m3(1L) == "A1+" && m3(3L) == "A3+" && m3(6L) == "a6+" &&
      m3(0L) == "A0", s"computed-key correlation must hit ids 1,3,6: $m3")
    // non-equality correlation refuses loudly
    refused(s"DELETE FROM $cat.t1 t WHERE EXISTS " +
      s"(SELECT 1 FROM $cat.gdpr g WHERE g.uid > t.id)", "not an equality")
    // a conjunct MIXING both sides in one expression cannot split
    refused(s"DELETE FROM $cat.t1 t WHERE EXISTS " +
      s"(SELECT 1 FROM $cat.gdpr g WHERE g.uid + t.id = 9)",
      "does not split")
    // correlated NOT IN decorrelates too (the r16 null-aware rewrite —
    // see the dedicated 3-valued-corners test): every survivor's v is
    // outside gdpr.why, so every per-row key set is EMPTY and
    // `NOT IN ()` is TRUE — all rows delete
    s.sql(s"DELETE FROM $cat.t1 t WHERE t.id NOT IN " +
      s"(SELECT g.uid FROM $cat.gdpr g WHERE g.why = t.v)")
    assert(rowsOf(s, cat).isEmpty,
      "empty per-row key sets make correlated NOT IN match every row")
  }

  test("composite-key EXISTS, correlated IN, and multi-column IN decorrelate/materialize") {
    val root = Files.createTempDirectory("graft-upd-comp-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    log.append(Seq((1L, "x", "a1"), (2L, "y", "a2"), (3L, "x", "a3"),
      (4L, "z", "a4")).toDF("id", "grp", "v").coalesce(1))
    SnapshotLog(spark, s"$root/ref").append(
      Seq((1L, "x", 10), (3L, "q", 30), (4L, "z", 40))
        .toDF("rid", "rgrp", "amt").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdcomp"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // COMPOSITE-key correlated EXISTS: both (id, grp) must match —
    // rows 1 (1,x matches 1,x) and 4 (4,z matches 4,z); row 3's rid
    // matches but rgrp 'q' does not
    s.sql(s"UPDATE $cat.t1 t SET v = upper(v) WHERE EXISTS " +
      s"(SELECT 1 FROM $cat.ref r WHERE r.rid = t.id AND r.rgrp = t.grp)")
    val m1 = rowsOf3(s, cat)
    assert(m1(1L) == "A1" && m1(4L) == "A4" && m1(2L) == "a2" &&
      m1(3L) == "a3", s"composite EXISTS must update rows 1 and 4: $m1")
    // correlated IN (top-level conjunct) canonicalizes to EXISTS:
    // t.id IN (rids of rows whose rgrp = t.grp) — row 1 (rid 1, grp x)
    // and row 4 (rid 4, grp z); row 3 fails (rid 3 has rgrp q ≠ x)
    s.sql(s"UPDATE $cat.t1 t SET v = concat(v, '!') WHERE t.id IN " +
      s"(SELECT r.rid FROM $cat.ref r WHERE r.rgrp = t.grp)")
    val m2 = rowsOf3(s, cat)
    assert(m2(1L) == "A1!" && m2(4L) == "A4!" && m2(3L) == "a3",
      s"correlated IN must hit rows 1 and 4: $m2")
    // MULTI-COLUMN uncorrelated row-IN materializes as the OR-of-AND
    // literal fold
    s.sql(s"DELETE FROM $cat.t1 WHERE (id, grp) IN " +
      s"(SELECT rid, rgrp FROM $cat.ref)")
    val m3 = rowsOf3(s, cat)
    assert(!m3.contains(1L) && !m3.contains(4L) &&
      m3.contains(2L) && m3.contains(3L),
      s"row-IN must delete exactly (1,x) and (4,z): $m3")
  }

  private def rowsOf3(s: org.apache.spark.sql.SparkSession,
      cat: String): Map[Long, String] =
    s.sql(s"SELECT id, v FROM $cat.t1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("correlated SCALAR subqueries decorrelate to a literal key-to-value map") {
    val root = Files.createTempDirectory("graft-upd-smap-").toString
    val log = SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id"))
    log.append(Seq((1L, 5.0, "a"), (2L, 5.0, "b"), (3L, 5.0, "c"),
      (4L, 5.0, "d")).toDF("id", "score", "v").coalesce(1))
    SnapshotLog(spark, s"$root/ref").append(
      Seq((1L, 10.0), (1L, 30.0), (3L, 7.0), (9L, 99.0))
        .toDF("rid", "amt").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdsmap"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // the enrichment-UPDATE shape: SET from a per-key aggregate — id 1
    // gets max(10,30)=30, id 3 gets 7, ids 2/4 have no ref rows →
    // SQL's empty-scalar answer NULL
    s.sql(s"UPDATE $cat.t1 t SET score = " +
      s"(SELECT max(amt) FROM $cat.ref r WHERE r.rid = t.id) " +
      "WHERE id <= 4")
    val m1 = s.sql(s"SELECT id, score FROM $cat.t1").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(m1(1L).contains(30.0) && m1(3L).contains(7.0) &&
      m1(2L).isEmpty && m1(4L).isEmpty,
      s"per-key aggregate SET with NULL for unmatched keys: $m1")
    // the WHERE form: threshold on a correlated sum — id 1 (sum 40)
    // qualifies; id 3 (7) does not; unmatched ids give NULL > 20 →
    // no match, exactly SQL
    s.sql(s"DELETE FROM $cat.t1 t WHERE " +
      s"(SELECT sum(amt) FROM $cat.ref r WHERE r.rid = t.id) > 20")
    val ids = s.sql(s"SELECT id FROM $cat.t1").collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L, 4L),
      s"the correlated-sum threshold must delete only id 1: $ids")
    // compound aggregates are ONE aliased expression — they re-group
    // per key and decorrelate too
    s.sql(s"UPDATE $cat.t1 t SET score = (SELECT max(amt) + min(amt) " +
      s"FROM $cat.ref r WHERE r.rid = t.id) WHERE id = 3")
    val m2 = s.sql(s"SELECT score FROM $cat.t1 WHERE id = 3").collect()
    assert(m2.head.getDouble(0) == 14.0, // max 7 + min 7
      s"compound per-key aggregate must apply: ${m2.toSeq}")
    // an EXPLICIT GROUP BY on the correlation key is the same per-key
    // aggregate — accepted, identical answer to the implicit regroup
    s.sql(s"UPDATE $cat.t1 t SET score = (SELECT sum(amt) " +
      s"FROM $cat.ref r WHERE r.rid = t.id GROUP BY r.rid) WHERE id = 3")
    val mg = s.sql(s"SELECT score FROM $cat.t1 WHERE id = 3").collect()
    assert(mg.head.getDouble(0) == 7.0,
      s"key-grouped correlated scalar must decorrelate: ${mg.toSeq}")
    // grouping by a NON-key expression is not a per-key scalar — refuse
    val exg = intercept[Exception] {
      s.sql(s"UPDATE $cat.t1 t SET score = (SELECT max(amt) " +
        s"FROM $cat.ref r WHERE r.rid = t.id GROUP BY r.amt) WHERE id = 3")
    }
    assert({
      def ms(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ ms(e.getCause))
      ms(exg).exists(_.contains("other than its correlation key"))
    }, exg.getMessage)
    // non-equality correlation refuses with the contract named
    val ex = intercept[Exception] {
      s.sql(s"UPDATE $cat.t1 t SET score = (SELECT max(amt) " +
        s"FROM $cat.ref r WHERE r.rid > t.id) WHERE id = 2")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.contains("scalar") || m.contains("subquer")),
      msgs(ex).mkString(" | "))
    // the tuple cap detects the DECORRELATED map by alias METADATA, not
    // by name: a user's own uncorrelated scalar that happens to alias a
    // large array `__graft_scalar_map` is a plain literal, never refused
    s.range(10050).select(col("id").as("n"))
      .createOrReplaceTempView("q_smap_big")
    s.sql(s"UPDATE $cat.t1 t SET score = CAST(size(" +
      "(SELECT collect_list(n) AS __graft_scalar_map FROM q_smap_big)" +
      ") AS DOUBLE) WHERE id = 2")
    val m3 = s.sql(s"SELECT score FROM $cat.t1 WHERE id = 2").collect()
    assert(m3.head.getDouble(0) == 10050.0,
      s"a user alias colliding with the sentinel name must not refuse: " +
        s"${m3.toSeq}")
  }

  test("mirror replays expr DML from recorded predicate SQL; reruns converge") {
    val src = clustered(freshTable(), feed = true)
    val dst = SnapshotLog(spark, freshTable(), statsColumns = Seq("id"))
    graft.table.LogMirror.mirror(src, dst) // in sync at v4
    // general-predicate UPDATE: OR across files — recorded as SQL text
    src.updateWhereExpr(col("id") === 5 || col("id") === 305,
      Seq("payload" -> concat(col("payload"), lit("!"))))
    // general-predicate DELETE: arithmetic condition
    src.deleteWhereExpr(col("id") % 100 === 7 && col("id") < 200)
    graft.table.LogMirror.mirror(src, dst)
    assert(dst.read().count() == src.read().count())
    assert(dst.read().where(col("id").isin(5, 305))
      .select("payload").as[String].collect().toSet ==
      Set("r0-5!", "r3-5!"))
    assert(dst.read().where(col("id").isin(7, 107)).count() == 0)
    assert(dst.read().where(col("id") === 207).count() == 1,
      "the delete's < 200 bound must replay exactly")
    graft.table.LogMirror.mirror(src, dst) // idempotent re-walk
    assert(dst.read().count() == src.read().count())
    // a non-deterministic predicate refuses up front (the counting
    // planner's passes must agree row-for-row — Spark would refuse it
    // inside the aggregate anyway; this names the contract)
    val ex = intercept[IllegalArgumentException] {
      src.deleteWhereExpr(col("id") >= 390 &&
        org.apache.spark.sql.functions.rand(7) >= -1)
    }
    assert(ex.getMessage.contains("non-deterministic"), ex.getMessage)
  }


  test("multi-column row-IN stays stack-safe and exact past 5,000 materialized tuples") {
    // r15 regression: the row-IN materialized as a LEFT-DEEP reduce(Or)
    // whose tree depth equaled the tuple count — Catalyst's recursive
    // transforms blew the thread stack in the thousands (q61 at sf0.1).
    // SubqueryPred.rowIn is depth-constant: 6,000 tuples must plan and
    // execute.
    val root = Files.createTempDirectory("graft-upd-rowin-").toString
    SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id")).append(
      (0L until 12000L).map(i => (i, s"g${i % 7}", s"v$i"))
        .toDF("id", "grp", "v").coalesce(2))
    SnapshotLog(spark, s"$root/ref").append(
      (0L until 12000L by 2).map(i => (i, s"g${i % 7}"))
        .toDF("rid", "rgrp").coalesce(2))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdrowin"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    s.sql(s"DELETE FROM $cat.t1 WHERE (id, grp) IN " +
      s"(SELECT rid, rgrp FROM $cat.ref)")
    val left = s.sql(s"SELECT id FROM $cat.t1").collect().map(_.getLong(0))
    assert(left.length == 6000 && left.forall(_ % 2 == 1),
      s"6,000-tuple row-IN must delete exactly the even ids: " +
        s"${left.length} rows left")
  }

  test("over-cap key sets execute as a JOIN: no literal ceiling on IN/NOT IN/EXISTS DML") {
    // the 100 TB shape: a GDPR-style DELETE whose key subquery yields
    // MORE than MaxKeys (100,000) keys must not refuse or materialize
    // a literal — the counting planner joins the key frame instead
    val root = Files.createTempDirectory("graft-upd-semi-").toString
    val log = SnapshotLog.withChangeFeed(spark, s"$root/t1",
      statsColumns = Seq("id"))
    log.append((0L until 10000L).map(i => (i, s"v$i"))
      .toDF("id", "v").coalesce(2))
    // 150,000 distinct even keys — 1.5× past the cap
    SnapshotLog(spark, s"$root/keys").append(
      (0L until 150000L).map(i => (i * 2, s"w$i")).toDF("k", "w")
        .coalesce(2))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdsemi"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    s.sql(s"DELETE FROM $cat.t1 WHERE id IN (SELECT k FROM $cat.keys)")
    val m1 = s.sql(s"SELECT id FROM $cat.t1").collect().map(_.getLong(0))
    assert(m1.length == 5000 && m1.forall(_ % 2 == 1),
      s"over-cap IN must delete the even ids: ${m1.length} left")
    // the join is not renderable SQL — the change feed records
    // rows-only images (mirror resync contract), never a WIDER replay
    assert(log.snapshot().changes.exists(_.predSql.isEmpty),
      "an over-cap delete must not record predicate SQL")
    // NOT IN past the cap: null-free key set → exact anti-join
    s.sql(s"UPDATE $cat.t1 SET v = 'ODD' WHERE id NOT IN " +
      s"(SELECT k FROM $cat.keys)")
    val m2 = s.sql(s"SELECT count(*) FROM $cat.t1 WHERE v = 'ODD'")
      .head().getLong(0)
    assert(m2 == 5000, s"over-cap NOT IN must update all survivors: $m2")
    // NOT IN whose over-cap key set carries a NULL is never TRUE — the
    // whole statement is a provable no-op, not a wrong answer
    SnapshotLog(spark, s"$root/keysn").append(
      ((0L until 150000L).map(i => (Some(i * 2), s"w$i")) :+
        ((None: Option[Long], "null-row")))
        .toDF("k", "w").coalesce(2))
    s.sql(s"DELETE FROM $cat.t1 WHERE id NOT IN (SELECT k FROM $cat.keysn)")
    assert(s.sql(s"SELECT count(*) FROM $cat.t1").head().getLong(0) == 5000,
      "NOT IN over a NULL-carrying key set matches nothing")
    // correlated EXISTS whose decorrelated key set is over-cap rides
    // the same join arm (coalesce polarity: NULL-safe both ways)
    s.sql(s"UPDATE $cat.t1 t SET v = concat(v, '+') WHERE EXISTS " +
      s"(SELECT 1 FROM $cat.keys g WHERE g.k = t.id + 1)")
    // ids where id+1 is even → all odd ids (+1 ≤ 299998) → every row
    val m3 = s.sql(s"SELECT count(*) FROM $cat.t1 WHERE v LIKE '%+'")
      .head().getLong(0)
    assert(m3 == 5000, s"over-cap decorrelated EXISTS must match: $m3")
    s.sql(s"DELETE FROM $cat.t1 t WHERE NOT EXISTS " +
      s"(SELECT 1 FROM $cat.keys g WHERE g.k = t.id + 1)")
    assert(s.sql(s"SELECT count(*) FROM $cat.t1").head().getLong(0) == 5000,
      "over-cap NOT EXISTS matches nothing here (every id+1 is even)")
    // multi-column row-IN past MaxTupleKeys joins on the tuple
    SnapshotLog(spark, s"$root/pairs").append(
      (0L until 12000L).map(i => (i, s"v$i")).toDF("p1", "p2").coalesce(2))
    s.sql(s"DELETE FROM $cat.t1 WHERE (id, v) IN " +
      s"(SELECT p1, p2 FROM $cat.pairs)")
    // survivors all carry v='...+' suffixes → tuples never match v$i
    assert(s.sql(s"SELECT count(*) FROM $cat.t1").head().getLong(0) == 5000,
      "tuple values must not match the suffixed rows")
    s.sql(s"UPDATE $cat.t1 SET v = concat('v', CAST(id AS STRING)) " +
      "WHERE id IS NOT NULL")
    s.sql(s"DELETE FROM $cat.t1 WHERE (id, v) IN " +
      s"(SELECT p1, p2 FROM $cat.pairs)")
    assert(s.sql(s"SELECT count(*) FROM $cat.t1").head().getLong(0) == 0,
      "over-cap tuple-IN must delete every matching row")
    // multi-column NOT IN past the cap rides the "no potential match"
    // join (r16): every keys row mismatches every pair tuple on the w
    // position (w… vs v…), so NOT IN is TRUE everywhere — full delete
    s.sql(s"DELETE FROM $cat.keys WHERE (k, w) NOT IN " +
      s"(SELECT p1, p2 FROM $cat.pairs)")
    assert(s.sql(s"SELECT count(*) FROM $cat.keys").head().getLong(0) == 0,
      "over-cap multi-column NOT IN must delete every definite-mismatch row")
  }

  test("over-cap NOT IN joins are null-aware: wildcard tuples and correlated prefixes") {
    val root = Files.createTempDirectory("graft-upd-pmjoin-").toString
    SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id")).append(
      (0L until 20000L).map(i => (i, s"g${i % 4}", "x"))
        .toDF("id", "grp", "v").coalesce(2))
    // 12,000 exact tuples + one (NULL, 'g1') wildcard — past
    // MaxTupleKeys, so the literal partial-match dispatch never builds
    SnapshotLog(spark, s"$root/pairsN").append(
      ((0L until 12000L).map(i => (Some(i), s"g${i % 4}")) :+
        ((None: Option[Long]) -> "g1"))
        .toDF("p1", "p2").coalesce(2))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gpmjoin"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // ANSI: a row is deleted iff NO tuple potentially matches — exact
    // tuples cover id < 12000; the (NULL, 'g1') tuple wildcards the id
    // and shields every grp='g1' row; deleted = id ≥ 12000 ∧ grp ≠ 'g1'
    s.sql(s"DELETE FROM $cat.t1 WHERE (id, grp) NOT IN " +
      s"(SELECT p1, p2 FROM $cat.pairsN)")
    val kept = s.sql(
      s"SELECT count(*), count(CASE WHEN id >= 12000 THEN 1 END) " +
        s"FROM $cat.t1").head()
    assert(kept.getLong(0) == 14000 && kept.getLong(1) == 2000,
      s"NULL-wildcard over-cap NOT IN must keep 12000 exact + 2000 " +
        s"shielded rows: $kept")
    // CORRELATED NOT IN whose materialized (key, value) set is past the
    // cap rides the same join with the key-prefix equality: per row,
    // S = {rg : rk = id} — a NULL rg shields (id%3=0), a mismatching
    // singleton updates, an EMPTY S (id ≥ 15000, and the NULL id row)
    // updates via NOT IN () = TRUE
    SnapshotLog(spark, s"$root/t2").append(
      ((0L until 20000L).map(i => (Some(i), s"g${i % 4}", "x")) :+
        ((None: Option[Long], "g9", "x")))
        .toDF("id", "grp", "v").coalesce(2))
    SnapshotLog(spark, s"$root/ref").append(
      (0L until 15000L).map(i =>
        (i, if (i % 3 == 0) None else Some(s"g${(i + 1) % 4}")))
        .toDF("rk", "rg").coalesce(2))
    s.sql(s"UPDATE $cat.t2 t SET v = 'M' WHERE grp NOT IN " +
      s"(SELECT r.rg FROM $cat.ref r WHERE r.rk = t.id)")
    val m = s.sql(s"SELECT count(CASE WHEN v = 'M' THEN 1 END), " +
      s"count(CASE WHEN v = 'x' THEN 1 END) FROM $cat.t2").head()
    assert(m.getLong(0) == 15001 && m.getLong(1) == 5000,
      s"over-cap correlated NOT IN: 10000 mismatch + 5000 empty-S + 1 " +
        s"NULL-key rows update, 5000 NULL-shielded keep: $m")
  }

  test("row-IN NULL semantics: partial-match dispatch and NULL-carrying tuples are ANSI-exact") {
    val root = Files.createTempDirectory("graft-upd-rowin3v-").toString
    // t1 rows exercise every left-side shape: full match, left-NULL
    // with a partial id match (ANSI: IN is NULL), left-NULL with no
    // partial match (ANSI: IN is FALSE — observable under NOT IN),
    // plain miss
    SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id")).append(
      Seq((1L, Some("x"), "a"), (2L, None, "b"), (4L, None, "c"),
        (6L, Some("q"), "d")).toDF("id", "grp", "v").coalesce(1))
    SnapshotLog(spark, s"$root/ref").append(
      Seq((1L, "x"), (4L, "w")).toDF("rid", "rgrp").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gupdrowin3v"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // NOT IN over a NULL-free list: (1,x) IN → kept; (2,NULL) has no
    // tuple matching id=2 → IN FALSE → deleted; (4,NULL) partially
    // matches (4,w) on the non-NULL position → IN NULL → kept (a
    // struct-equality-only row-IN would wrongly delete it); (6,q)
    // FALSE → deleted
    s.sql(s"DELETE FROM $cat.t1 WHERE (id, grp) NOT IN " +
      s"(SELECT rid, rgrp FROM $cat.ref)")
    val m1 = s.sql(s"SELECT id FROM $cat.t1").collect().map(_.getLong(0)).toSet
    assert(m1 == Set(1L, 4L),
      s"ANSI NOT IN must delete ids 2 and 6 only, kept: $m1")
    // a NULL-carrying LIST tuple can only answer NULL or FALSE: with
    // (NULL, y) in the list, (3,y) gets IN = NULL (kept by both IN and
    // NOT IN deletes); (7,z) gets FALSE → NOT IN deletes it
    SnapshotLog(spark, s"$root/t2").append(
      Seq((3L, "y", "e"), (7L, "z", "f")).toDF("id", "grp", "v")
        .coalesce(1))
    SnapshotLog(spark, s"$root/refn").append(
      Seq((Some(1L), "x"), (None, "y")).toDF("rid", "rgrp").coalesce(1))
    s.sql(s"DELETE FROM $cat.t2 WHERE (id, grp) NOT IN " +
      s"(SELECT rid, rgrp FROM $cat.refn)")
    val m2 = s.sql(s"SELECT id FROM $cat.t2").collect().map(_.getLong(0)).toSet
    assert(m2 == Set(3L),
      s"a NULL-keyed list tuple must shield (3,y) but not (7,z): $m2")
    // arity > 4 takes the balanced-fold arm (no 2^k dispatch): still
    // exact on a plain match
    SnapshotLog(spark, s"$root/t3").append(
      Seq((1L, 1L, 1L, 1L, 1L, "hit"), (1L, 1L, 1L, 1L, 2L, "miss"))
        .toDF("a", "b", "c", "d", "e", "v").coalesce(1))
    SnapshotLog(spark, s"$root/ref5").append(
      Seq((1L, 1L, 1L, 1L, 1L)).toDF("ra", "rb", "rc", "rd", "re")
        .coalesce(1))
    s.sql(s"DELETE FROM $cat.t3 WHERE (a, b, c, d, e) IN " +
      s"(SELECT ra, rb, rc, rd, re FROM $cat.ref5)")
    val m3 = s.sql(s"SELECT v FROM $cat.t3").collect().map(_.getString(0))
    assert(m3.toSeq == Seq("miss"), s"arity-5 row-IN must delete 'hit': $m3")
  }

  test("correlated NOT IN decorrelates null-aware: every 3-valued corner, both arities") {
    val root = Files.createTempDirectory("graft-upd-corrnotin-").toString
    // jk = nullable correlation key, grp = nullable left value
    SnapshotLog(spark, s"$root/t1", statsColumns = Seq("id")).append(
      Seq((1L, Some(1L), Some("x"), "a"), (2L, Some(2L), Some("y"), "b"),
        (3L, Some(3L), Some("z"), "c"), (4L, Some(1L), None, "d"),
        (5L, Some(3L), None, "e"), (6L, None, Some("w"), "f"),
        (7L, Some(4L), Some("z"), "g"), (8L, Some(4L), Some("a"), "h"))
        .toDF("id", "jk", "grp", "v").coalesce(1))
    SnapshotLog(spark, s"$root/ref").append(
      Seq((1L, Some("x")), (2L, None), (4L, Some("z")), (4L, Some("q")))
        .toDF("rk", "rv").coalesce(1))
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    val cat = "gcorrnotin"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    // ANSI per row: 1 → FALSE (exact hit) kept; 2 → NULL (NULL inner)
    // kept; 3 → TRUE (empty group) deleted; 4 → NULL (NULL left, group
    // nonempty) kept; 5 → TRUE (NULL left BUT empty group) deleted;
    // 6 → TRUE (NULL correlation key ⟹ empty group) deleted;
    // 7 → FALSE (hit in 2-value group) kept; 8 → TRUE (null-free
    // group, no hit) deleted
    s.sql(s"DELETE FROM $cat.t1 t WHERE grp NOT IN " +
      s"(SELECT rv FROM $cat.ref r WHERE r.rk = t.jk)")
    val kept = s.sql(s"SELECT id FROM $cat.t1").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 7L),
      s"single-column correlated NOT IN must delete 3,5,6,8 — kept $kept")
    // composite LEFT tuple: (grp, v) vs per-key (rv2, rw2) — the
    // key-prefixed row-IN's null-pattern dispatch decides
    SnapshotLog(spark, s"$root/ref2").append(
      Seq((1L, Some("x"), "a"), (2L, None, "b"), (4L, Some("z"), "q"))
        .toDF("rk", "rv2", "rw2").coalesce(1))
    // 1 → exact hit FALSE kept; 2 → (NULL rv2, 'b'='b') NULL kept;
    // 4 → NULL grp but 'd'≠'a' mismatches every tuple → TRUE updated;
    // 7 → 'g'≠'q' → TRUE updated
    s.sql(s"UPDATE $cat.t1 t SET v = 'M' WHERE (grp, v) NOT IN " +
      s"(SELECT rv2, rw2 FROM $cat.ref2 r WHERE r.rk = t.jk)")
    val vs = s.sql(s"SELECT id, v FROM $cat.t1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vs == Map(1L -> "a", 2L -> "b", 4L -> "M", 7L -> "M"),
      s"composite correlated NOT IN must update 4 and 7 only: $vs")
    // non-equality correlation still refuses with the contract named
    val ex = intercept[Exception] {
      s.sql(s"DELETE FROM $cat.t1 t WHERE grp NOT IN " +
        s"(SELECT rv FROM $cat.ref r WHERE r.rk > t.jk)")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("not an equality")),
      msgs(ex).mkString(" | "))
  }

  private def rowsOf(s: org.apache.spark.sql.SparkSession,
      cat: String): Map[Long, String] = {
    import s.implicits._
    s.sql(s"SELECT id, v FROM $cat.t1").as[(Long, String)].collect().toMap
  }
}
