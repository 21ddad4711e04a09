package graft.table

import org.apache.spark.sql.SparkSession

/** One-off measurement tool (not a graded query): metadata bytes a
  * commit writes as the table's file count grows, across the
  * inline→segmented manifest switch ([[SnapshotLog.InlineFileLimit]]).
  *
  * Appends fixed 20-file chunks to one table and records, per version:
  * the manifest's size and the bytes of any NEW segment files the
  * commit wrote. Inline manifests re-serialize every file's metadata —
  * bytes grow linearly with the table; segmented commits write one
  * ~constant-sized segment for the new files plus a name-list manifest.
  * Results land in BASELINE.md "Segmented-manifest payoff". Run:
  * {{{ sbt "runMain graft.table.SegmentPayoff /root/testdata/sf0.1" }}} */
object SegmentPayoff {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-segpayoff-")
    val tableDir = work.resolve("t").toString
    val log = SnapshotLog(spark, tableDir, statsColumns = Seq("l_orderkey"))
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val logDir = new java.io.File(tableDir, SnapshotLog.LogDirName)

    def metaFiles(): Map[String, Long] =
      Option(logDir.listFiles()).getOrElse(Array.empty)
        .map(f => f.getName -> f.length()).toMap

    var before = metaFiles()
    val rows = (1 to 10).map { i =>
      log.append(src.limit(4000).repartition(20))
      val after = metaFiles()
      val manifest = after.keys.filter(_.startsWith("v")).max
      val newSegs = (after.keySet -- before.keySet).filter(_.startsWith("seg-"))
      before = after
      (i, i * 20, after(manifest), newSegs.toSeq.map(after).sum)
    }
    val s = log.snapshot()
    println(rows.map { case (v, files, mb, sb) =>
      s"""{"version":$v,"files":$files,"manifest_bytes":$mb,"new_segment_bytes":$sb}"""
    }.mkString("[", ",", "]"))
    println(s"""{"final_files":${s.files.size},"total_rows":${s.rows}}""")
    spark.stop()
  }
}
