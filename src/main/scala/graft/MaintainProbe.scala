package graft

import graft.table.{PartitionField, SnapshotLog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for one log-table MAINTENANCE cycle: ingest the events
  * table as five day(ts)-partitioned appends, run incremental
  * compaction (compactSmall — rewrite set chosen from manifest bytes,
  * zero file-status calls), then vacuum — timing each phase. Run at
  * sf0.1 and a generated sf1.0 to measure the sf→10×sf scaling of the
  * maintenance path (BASELINE.md "Scale probe").
  *
  * Usage: runMain graft.MaintainProbe <sfDir> <scratchTableDir>
  */
object MaintainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tableDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[maintain] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    // events ts normalized to µs TimestampType (the fixture is parquet
    // TIMESTAMP(NANOS) — same conversion every query path uses)
    val events = graft.ops.Relational.events(spark, sfDir)
    val log = SnapshotLog.partitioned(spark, tableDir,
      Seq(PartitionField("ts", "day")), statsColumns = Seq("user_id"))
    timed("ingest-5-appends") {
      (0 until 5).foreach { slice =>
        log.append(events.where(pmod(col("event_id"), lit(5L)) === slice))
      }
    }
    val before = log.snapshot()
    println(s"[maintain] files-before=${before.files.size} rows=${before.rows}")
    timed("compact-small")(log.compactSmall(targetFileBytes = 64L * 1024 * 1024))
    val after = log.snapshot()
    println(s"[maintain] files-after=${after.files.size} rows=${after.rows}")
    require(after.rows == before.rows, "maintenance must not change rows")
    timed("vacuum")(log.vacuum(keepLast = 1, graceMs = 0L))
    println(s"[maintain] done version=${log.currentVersion()}")
    spark.stop()
  }
}
