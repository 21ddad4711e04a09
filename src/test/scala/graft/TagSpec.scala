package graft

import graft.table.{GraftTableCatalog, SnapshotLog}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Named tags ([[SnapshotLog.createTag]]): immutable refs outside the
  * version stream — resolvable from every travel surface, retained past
  * any vacuum horizon, gone only on an explicit drop. */
class TagSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-tag-").resolve("t").toString

  test("tags pin versions; immutable; idempotent re-create; drop retargets") {
    val log = SnapshotLog(spark, fresh())
    log.append(Seq((1, "a")).toDF("id", "v").coalesce(1)) // v1
    log.append(Seq((2, "b")).toDF("id", "v").coalesce(1)) // v2
    assert(log.createTag("audit.2026-q1") == 2L)
    assert(log.createTag("audit.2026-q1", 2L) == 2L, "same-target re-create is idempotent")
    assert(log.createTag("baseline", 1L) == 1L)
    assert(log.tags() == Map("audit.2026-q1" -> 2L, "baseline" -> 1L))
    assertThrows[IllegalArgumentException](log.createTag("baseline", 2L))
    assertThrows[IllegalArgumentException](log.createTag("no spaces"))
    assertThrows[IllegalArgumentException](log.createTag("ok", 99L))
    log.dropTag("baseline")
    assert(log.createTag("baseline", 2L) == 2L, "drop + create retargets")
    // tagging commits nothing: the version stream is untouched
    assert(log.currentVersion() == 2L)
  }

  test("a tagged version survives vacuum; dropping the tag releases it") {
    val log = SnapshotLog(spark, fresh())
    (0 until 4).foreach(i =>
      log.append(Seq((i, s"r$i")).toDF("id", "v").coalesce(1))) // v1..v4
    log.createTag("keeper", 1L)
    log.vacuum(keepLast = 1, graceMs = 0L)
    // v1 (tagged) still reads — manifest AND data file retained
    assert(log.read(1L).as[(Int, String)].collect().toSeq == Seq((0, "r0")))
    // untagged expired versions are gone
    assertThrows[IllegalArgumentException](log.read(2L))
    log.dropTag("keeper")
    log.vacuum(keepLast = 1, graceMs = 0L)
    assertThrows[IllegalArgumentException](log.read(1L))
    assert(log.read().count() == 4, "the head is untouched throughout")
  }

  test("every travel surface resolves a tag: typed, catalog SQL, TVF") {
    val root = Files.createTempDirectory("graft-tag-sql-").toString
    val dir = s"$root/t"
    val log = SnapshotLog(spark, dir)
    log.append(Seq((1, "old")).toDF("id", "v").coalesce(1))  // v1
    log.createTag("prod")
    log.append(Seq((2, "new")).toDF("id", "v").coalesce(1))  // v2
    assert(log.versionOfTag("prod").contains(1L))
    spark.conf.set("spark.sql.catalog.gtag", classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtag.root", root)
    assert(spark.sql("SELECT count(*) FROM gtag.t VERSION AS OF 'prod'")
      .head().getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM gtag.t").head().getLong(0) == 2L)
    assertThrows[Exception](
      spark.sql("SELECT * FROM gtag.t VERSION AS OF 'nope'").collect())
    val s = org.apache.spark.sql.GraftBridge
      .sessionWithExtensions(spark, new graft.plans.GraftExtensions()(_))
    assert(s.sql(s"SELECT count(*) AS n FROM graft_log('$dir', 'prod')")
      .head().getLong(0) == 1L)
  }
}
