package graft

import graft.jobs.LayoutJob
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Layout (sort-clustering) contract, proven from the parquet footers
  * themselves: before clustering every file's [min, max] on the key
  * spans ~the full value range (append-order layout — min/max stats can
  * skip nothing); after `LayoutJob.clusterBy` the per-file ranges are
  * pairwise DISJOINT, so a range predicate reads only intersecting
  * files. Data identity and the verified swap ride the same protocol as
  * CompactionSpec. */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Append-order layer: key k is pseudo-random (deterministic), so all
    * four part files cover ~the whole [0, 10000) range. */
  private def appendOrderLayer(): String = {
    val dir = Files.createTempDirectory("graft-layout-").resolve("layer").toString
    (0 until 4000)
      .map(i => (((i * 2654435761L) % 10000).toInt, s"payload-$i"))
      .toDF("k", "payload")
      .repartition(4)
      .write.option("compression", "snappy").parquet(dir)
    dir
  }

  /** Per-file [min, max] of int column `k`, straight from the footers. */
  private def fileRanges(dir: String): Seq[(Int, Int)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.toString), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala.toSeq.map(
            _.getColumns.asScala.find(_.getPath.toDotString == "k").get.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[Number].intValue).min,
            stats.map(_.genericGetMax.asInstanceOf[Number].intValue).max)
        } finally r.close()
      }
  }

  test("clusterBy rewrites overlapping file ranges into disjoint ones, rows intact") {
    val dir = appendOrderLayer()
    val expected = spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq
    val beforeRanges = fileRanges(dir)
    assert(beforeRanges.size == 4)
    // append-order layout: every file spans (almost) the full key range,
    // so every pair of files overlaps — min/max stats can skip nothing
    assert(beforeRanges.forall { case (lo, hi) => hi - lo > 5000 },
      s"fixture files must span the range, got $beforeRanges")

    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length).sum
    val m = LayoutJob.clusterBy(spark, dir, Seq("k"), targetFileBytes = bytes / 4 + 1)
    assert(m.rows == 4000 && m.filesBefore == 4)
    assert(m.filesAfter >= 2, s"need multiple files to show disjointness: $m")

    // after: ranges pairwise disjoint — sort by min, each file starts
    // past the previous file's max (range partitioning keeps equal keys
    // in one partition, so strict disjointness holds)
    val after = fileRanges(dir).sortBy(_._1)
    after.sliding(2).foreach {
      case Seq((_, hiPrev), (loNext, _)) =>
        assert(loNext > hiPrev, s"file ranges overlap after clustering: $after")
      case _ => ()
    }
    // identical data, swap left no residue
    assert(spark.read.parquet(dir).as[(Int, String)].collect().sorted.toSeq == expected)
    val siblings = new java.io.File(dir).getParentFile.list().toSeq
    assert(siblings == Seq("layer"), s"swap left residue: $siblings")
  }

  test("a range predicate's matching files shrink from all to one after clustering") {
    val dir = appendOrderLayer()
    def matchingFiles(lo: Int, hi: Int): Int =
      fileRanges(dir).count { case (fLo, fHi) => fHi >= lo && fLo <= hi }
    // the skipping arithmetic the parquet reader applies, computed from
    // the same footer stats it uses: before clustering a narrow range
    // predicate intersects EVERY file; after, exactly the files whose
    // range contains it (here 1 of 4)
    assert(matchingFiles(4000, 4500) == 4, "append-order layout must match all files")
    LayoutJob.clusterBy(spark, dir, Seq("k"),
      targetFileBytes = new java.io.File(dir).listFiles()
        .filter(_.isFile).map(_.length).sum / 4 + 1)
    assert(matchingFiles(4000, 4500) <= 2,
      s"clustered layout must confine a narrow range to few files: ${fileRanges(dir)}")
  }
}
