package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement tool (not a graded query): quantify what the
  * manifest buys at read time on a real table. Builds a SnapshotLog
  * from `lineitem`, appends it in shuffled chunks (the append-order
  * worst case), clusters through the log, then times the same narrow
  * range aggregate three ways:
  *
  *  1. plain directory scan + filter (footer stats only, append order),
  *  2. log full read + filter (same files, schema from the manifest),
  *  3. `readBetween` (manifest-pruned file list).
  *
  * Results land in BASELINE.md "Table-format payoff". Run:
  * {{{ sbt "runMain graft.table.LogPayoff /root/testdata/sf0.1" }}} */
object LogPayoff {
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

    val work = java.nio.file.Files.createTempDirectory("graft-logpayoff-")
    val tableDir = work.resolve("t").toString
    val log = SnapshotLog(spark, tableDir, statsColumns = Seq("l_orderkey"))
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")

    // shuffled appends: every file spans ~the full key range, the
    // append-only worst case for stats. The same chunks also land in a
    // plain directory — the no-log status-quo baseline.
    val plainDir = work.resolve("plain").toString
    (0 until 4).foreach { i =>
      val chunk = src.where(pmod(col("l_partkey"), lit(4)) === i).repartition(4)
      log.append(chunk)
      chunk.write.mode("append").parquet(plainDir)
    }
    val appended = log.snapshot()
    graft.jobs.LayoutJob.clusterByLog(log, Seq("l_orderkey"),
      targetFileBytes = math.max(1L, appended.bytes / 16))
    log.vacuum(keepLast = 1, graceMs = 0L) // data/ holds only live files
    val clustered = log.snapshot()

    val bounds = src.agg(min("l_orderkey"), max("l_orderkey")).head()
    val (kLo, kHi) = (bounds.getLong(0), bounds.getLong(1))
    // a ~1% key slice
    val hi = kLo + math.max(1L, (kHi - kLo) / 100)

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def agg(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)), sum("l_extendedprice")).head()
      (r.getLong(0), String.valueOf(r.get(1)))
    }
    // warm the JVM/codegen once on an unrelated shape
    agg(src.where(col("l_orderkey") < kLo))

    // A: append-order plain directory (status quo — footer stats span
    //    the full range and skip nothing); B: clustered log, plain full
    //    read + filter (footer skipping only); C: manifest-pruned read
    val dirDf = spark.read.parquet(plainDir)
      .where(col("l_orderkey").between(kLo, hi))
    val fullDf = log.read().where(col("l_orderkey").between(kLo, hi))
    val prunedDf = log.readBetween("l_orderkey", kLo, hi)

    val (aDir, tDir) = time(agg(dirDf))
    val (aFull, tFull) = time(agg(fullDf))
    val (aPruned, tPruned) = time(agg(prunedDf))
    // counts must agree exactly; the double sum exists to force a data
    // read but its last ulps depend on summation order across layouts
    require(aDir._1 == aFull._1 && aFull._1 == aPruned._1,
      s"row counts must agree: $aDir / $aFull / $aPruned")

    println(f"""{"rows":${clustered.rows},"files":${clustered.files.size},""" +
      f""""pruned_files_opened":${prunedDf.inputFiles.length},""" +
      f""""dir_scan_sec":$tDir%.3f,"log_full_sec":$tFull%.3f,""" +
      f""""log_pruned_sec":$tPruned%.3f,"slice_rows":${aPruned._1}}""")
    spark.stop()
  }
}
