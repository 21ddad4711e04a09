package graft

import graft.jobs.CompactionJob
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Compaction contract: fewer files, identical data, idempotent re-run,
  * and a no-op when the layer is already compact. */
class CompactionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fragmentedLayer(): String = {
    val dir = Files.createTempDirectory("graft-compact-").resolve("prepared").toString
    // three appends × 4 partitions each = 12 small part files, the shape
    // the append-only prepared layer accumulates run over run
    (0 until 3).foreach { run =>
      (0 until 400).map(i => (run * 1000 + i, s"row-$run-$i")).toDF("id", "payload")
        .repartition(4)
        .write.option("compression", "snappy").mode("append").parquet(dir)
    }
    dir
  }

  private def partFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq.map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))

  test("compaction merges small files and preserves every row") {
    val dir = fragmentedLayer()
    val expected = spark.read.parquet(dir).as[(Int, String)].collect().sorted
    assert(partFiles(dir).size == 12)

    val m = CompactionJob.run(spark, dir, targetFileBytes = 1L << 30)
    assert(m.rewritten && m.filesBefore == 12 && m.filesAfter == 1,
      s"expected 12 -> 1 files, got $m")
    assert(m.rows.contains(1200L))
    val after = spark.read.parquet(dir).as[(Int, String)].collect().sorted
    assert(after.toSeq == expected.toSeq, "compaction must not change the data")
    assert(partFiles(dir).size == 1)
    // no temp/backup residue next to the layer
    val siblings = new java.io.File(dir).getParentFile.list().toSeq
    assert(siblings == Seq("prepared"), s"swap left residue: $siblings")
  }

  test("compaction is idempotent: a second pass is a no-op") {
    val dir = fragmentedLayer()
    assert(CompactionJob.run(spark, dir, targetFileBytes = 1L << 30).rewritten)
    val second = CompactionJob.run(spark, dir, targetFileBytes = 1L << 30)
    assert(!second.rewritten && second.filesBefore == second.filesAfter,
      s"already-compact layer must not be rewritten: $second")
  }

  test("partitioned compaction: each run directory compacts independently") {
    val dir = Files.createTempDirectory("graft-compact-").resolve("raw").toString
    (0 until 2).foreach { run =>
      (0 until 400).map(i => (i, s"r$run-$i")).toDF("id", "payload")
        .withColumn("ETL_PART_KEY", org.apache.spark.sql.functions.lit(s"run$run"))
        .repartition(4)
        .write.partitionBy("ETL_PART_KEY").mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir)
      .as[(Int, String, String)].collect().sorted.toSeq
    val perPart = CompactionJob.runPartitioned(spark, dir, targetFileBytes = 1L << 30)
    assert(perPart.keySet == Set("ETL_PART_KEY=run0", "ETL_PART_KEY=run1"))
    assert(perPart.values.forall(m => m.rewritten && m.filesBefore == 4 && m.filesAfter == 1),
      s"each partition must compact 4 -> 1: $perPart")
    val after = spark.read.parquet(dir)
      .as[(Int, String, String)].collect().sorted.toSeq
    assert(after == before, "partitioned compaction must preserve rows and partition values")
  }

  test("a layer within the target file count is left untouched") {
    val dir = fragmentedLayer()
    val before = partFiles(dir).toSet
    // tiny target → required file count >= current count → no rewrite
    val m = CompactionJob.run(spark, dir, targetFileBytes = 1L)
    assert(!m.rewritten)
    assert(m.rows.isEmpty, "no-op pass reads no data, so it reports no count")
    assert(partFiles(dir).toSet == before, "no-op pass must not touch files")
  }

  test("recovery: dangling .compact.bak with no layer is restored, then compacted") {
    val dir = fragmentedLayer()
    val expected = spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq
    val d = new java.io.File(dir)
    // simulate a crash between the two swap renames: data only in .bak
    val bak = new java.io.File(d.getParentFile, s".${d.getName}.compact.bak")
    assert(d.renameTo(bak))
    val m = CompactionJob.run(spark, dir, targetFileBytes = 1L << 30)
    assert(m.rewritten && m.filesAfter == 1)
    assert(spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq == expected,
      "recovery must restore the pre-crash data before compacting it")
    assert(!bak.exists())
  }

  test("recovery: .compact.bak NEXT TO a live layer fails loudly") {
    val dir = fragmentedLayer()
    val d = new java.io.File(dir)
    val bak = new java.io.File(d.getParentFile, s".${d.getName}.compact.bak")
    assert(bak.mkdirs())
    val ex = intercept[IllegalStateException](
      CompactionJob.run(spark, dir, targetFileBytes = 1L << 30))
    assert(ex.getMessage.contains("resolve manually"))
    assert(partFiles(dir).size == 12, "ambiguous state must leave the layer untouched")
    bak.delete()
  }

  test("recovery: leftover unverified .compact.tmp is discarded, not swapped in") {
    val dir = fragmentedLayer()
    val expected = spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq
    val d = new java.io.File(dir)
    val tmpDir = new java.io.File(d.getParentFile, s".${d.getName}.compact.tmp")
    assert(tmpDir.mkdirs())
    // poison content: if recovery swapped tmp in, the read below would differ
    java.nio.file.Files.writeString(tmpDir.toPath.resolve("garbage"), "not parquet")
    val m = CompactionJob.run(spark, dir, targetFileBytes = 1L << 30)
    assert(m.rewritten)
    assert(spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq == expected)
    assert(!tmpDir.exists())
  }
}
