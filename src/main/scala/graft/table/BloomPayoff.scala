package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement tool (not a graded query): quantify what the
  * per-file key blooms buy on a point lookup over a layout range stats
  * cannot prune. Builds a SnapshotLog from `lineitem` with blooms on
  * `l_orderkey`, appends it hash-SCATTERED (every file spans ~the whole
  * key range — the shape of any table not clustered on the lookup key),
  * then times the same `key IN (…)` aggregate three ways:
  *
  *  1. plain directory scan + IN filter (footer stats span everything),
  *  2. log full read + IN filter (same files, manifest schema),
  *  3. `readKeys` (bloom-gated file list).
  *
  * Results land in BASELINE.md "Point-lookup payoff". Run:
  * {{{ sbt "runMain graft.table.BloomPayoff /root/testdata/sf0.1" }}} */
object BloomPayoff {
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

    val work = java.nio.file.Files.createTempDirectory("graft-bloompayoff-")
    val tableDir = work.resolve("t").toString
    val log = SnapshotLog(spark, tableDir,
      statsColumns = Seq("l_orderkey"), bloomColumns = Seq("l_orderkey"))
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")

    // hash-scattered appends: chunked on an interleaved key residue so
    // every file holds keys from across the WHOLE range (min/max stats
    // are useless for a point lookup), while hashing each chunk on the
    // key itself keeps one key's rows together — the realistic write
    // discipline for a point-lookup table. The same chunks land in a
    // plain directory — the no-log baseline.
    val plainDir = work.resolve("plain").toString
    (0 until 4).foreach { i =>
      val chunk = src.where(pmod(col("l_orderkey"), lit(4)) === i)
        .repartition(4, col("l_orderkey"))
      log.append(chunk)
      chunk.write.mode("append").parquet(plainDir)
    }
    val s = log.snapshot()

    // a handful of real keys drawn across the range
    val keys = src.select("l_orderkey").distinct()
      .orderBy("l_orderkey").limit(2000).collect()
      .map(_.getLong(0)).grouped(400).map(_.head).toSeq

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1))).head().getLong(0)
    agg(src.where(col("l_orderkey") < 0)) // warm codegen

    val dirDf = spark.read.parquet(plainDir)
      .where(col("l_orderkey").isInCollection(keys))
    val fullDf = log.read().where(col("l_orderkey").isInCollection(keys))
    val keyedDf = log.readKeys("l_orderkey", keys)

    val (aDir, tDir) = time(agg(dirDf))
    val (aFull, tFull) = time(agg(fullDf))
    val (aKeyed, tKeyed) = time(agg(keyedDf))
    require(aDir == aFull && aFull == aKeyed,
      s"row counts must agree: $aDir / $aFull / $aKeyed")

    println(f"""{"rows":${s.rows},"files":${s.files.size},""" +
      f""""keys":${keys.size},"keyed_files_opened":${keyedDf.inputFiles.length},""" +
      f""""dir_scan_sec":$tDir%.3f,"log_full_sec":$tFull%.3f,""" +
      f""""log_keyed_sec":$tKeyed%.3f,"hit_rows":$aKeyed}""")
    spark.stop()
  }
}
