package graft

import graft.jobs.LayoutJob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Measurement harness for the layout jobs: what does clustering
  * actually buy a range-predicate scan at a real scale factor?
  *
  * Copies a table to a scratch dir, runs a narrow range query on the
  * append-order layout, rewrites with [[LayoutJob.clusterBy]] /
  * [[LayoutJob.zorderBy]], runs the same query again, and prints one
  * JSON line with decoded-row counts (the scan's numOutputRows metric —
  * rows the parquet reader actually materialized after row-group/page
  * skipping) and min-of-reps wall seconds for each layout. The decoded
  * count is the scale-relevant number: at 100 TB wall time follows bytes
  * decoded, and the local wall clock mostly measures JVM overheads.
  *
  * Usage: runMain graft.LayoutBench [sfDir] [reps]
  */
object LayoutBench {
  private def decoded(q: DataFrame): (Long, Long) = {
    val hits = q.collect().length.toLong
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    (scan.metrics("numOutputRows").value, hits)
  }

  private def minWall(reps: Int)(run: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files.createTempDirectory("graft-layoutbench-")
    // many small appends, like a promoted-per-run prepared prefix: 16
    // append-order files, each spanning the full key range
    val dir = s"$scratch/lineitem"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(16).write.parquet(dir)

    // the hot predicate: a ~2% l_orderkey band (plus a second-column
    // band for the z-order case)
    def q1(): DataFrame = spark.read.parquet(dir)
      .filter(col("l_orderkey").between(100000, 112000))
      .select("l_orderkey", "l_extendedprice")
    def q2(): DataFrame = spark.read.parquet(dir)
      .filter(col("l_partkey").between(10000, 11000))
      .select("l_partkey", "l_extendedprice")

    val (decBefore1, hits1) = decoded(q1())
    val (decBefore2, hits2) = decoded(q2())
    val wallBefore = minWall(reps)(q1().collect())

    val mCluster = LayoutJob.clusterBy(spark, dir, Seq("l_orderkey"))
    val (decCluster1, hitsC1) = decoded(q1())
    // the lexicographic blind spot z-order exists to fix: a predicate on
    // a non-leading column skips (almost) nothing
    val (decCluster2, hitsC2) = decoded(q2())
    val wallCluster = minWall(reps)(q1().collect())
    require(hitsC1 == hits1 && hitsC2 == hits2,
      s"clusterBy changed results: $hitsC1/$hitsC2 != $hits1/$hits2")

    val mZ = LayoutJob.zorderBy(spark, dir, Seq("l_orderkey", "l_partkey"))
    val (decZ1, hitsZ1) = decoded(q1())
    val (decZ2, hitsZ2) = decoded(q2())
    val wallZ = minWall(reps)(q1().collect())
    require(hitsZ1 == hits1 && hitsZ2 == hits2, "zorderBy changed results")

    println(Seq(
      s""""table":"lineitem"""",
      s""""rows_hit_q1":$hits1""",
      s""""decoded_append_q1":$decBefore1""",
      s""""decoded_clustered_q1":$decCluster1""",
      s""""decoded_zorder_q1":$decZ1""",
      s""""rows_hit_q2":$hits2""",
      s""""decoded_append_q2":$decBefore2""",
      s""""decoded_clustered_q2":$decCluster2""",
      s""""decoded_zorder_q2":$decZ2""",
      s""""files_cluster":${mCluster.filesAfter}""",
      s""""files_zorder":${mZ.filesAfter}""",
      s""""wall_append_q1":$wallBefore""",
      s""""wall_clustered_q1":$wallCluster""",
      s""""wall_zorder_q1":$wallZ""").mkString("{", ",", "}"))

    org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
    spark.stop()
  }
}
