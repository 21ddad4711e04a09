package graft

import graft.streaming.LogChangeFeed
import graft.table.SnapshotLog
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming SINK into a log table ([[graft.streaming.LogStreamSink]]):
  * `writeStream.format("graft-log")` commits each micro-batch as one
  * transactional version with the engine's own exactly-once watermark —
  * a log-to-log streaming pipeline becomes two `format(...)` calls. */
class LogSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(p: String): String = Files.createTempDirectory(p).toString

  test("append mode: micro-batches land as transactional versions, exactly once across restart") {
    val srcDir = fresh("graft-sink-src-") + "/s"
    val dstDir = fresh("graft-sink-dst-") + "/d"
    val ckpt = fresh("graft-sink-ckpt-")
    val src = SnapshotLog(spark, srcDir)
    src.append((0 until 20).map(i => (i, s"a$i")).toDF("id", "v"))
    def run(): Unit = {
      val q = LogChangeFeed.readChangesStream(spark, srcDir)
        .writeStream
        .format("graft-log") // short name: the service-registered provider
        .option("path", dstDir)
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }
    run()
    val dst = SnapshotLog(spark, dstDir)
    assert(dst.read().as[(Int, String)].collect().sorted.toSeq ==
      (0 until 20).map(i => (i, s"a$i")))
    val committed = dst.currentVersion()
    // restart on the same checkpoint: nothing re-delivers, nothing re-commits
    run()
    assert(SnapshotLog(spark, dstDir).currentVersion() == committed,
      "a restart with no new data must commit nothing")
    // new source data arrives exactly once through the restart
    src.append(Seq((100, "z")).toDF("id", "v"))
    run()
    assert(SnapshotLog(spark, dstDir).read().count() == 21)
  }

  test("complete mode: each batch atomically replaces the table (streaming aggregation)") {
    val srcDir = fresh("graft-sink-src-") + "/s"
    val dstDir = fresh("graft-sink-dst-") + "/d"
    val ckpt = fresh("graft-sink-ckpt-")
    val src = SnapshotLog(spark, srcDir)
    src.append(Seq((1, "x"), (1, "y"), (2, "z")).toDF("id", "v").coalesce(1))
    val q = LogChangeFeed.readChangesStream(spark, srcDir)
      .groupBy($"id").count()
      .writeStream
      .format("graft-log")
      .option("path", dstDir)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    src.append(Seq((2, "w")).toDF("id", "v").coalesce(1))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val got = SnapshotLog(spark, dstDir).read()
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 2L, 2 -> 2L),
      "the final complete-mode state is the full aggregate")
  }

  test("writeStream.toTable: per-epoch txn commits through the native write, table-declared layout") {
    val root = fresh("graft-sink-cat-")
    spark.conf.set("spark.sql.catalog.gsink1",
      classOf[graft.table.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsink1.root", root)
    spark.sql(
      "CREATE TABLE gsink1.dst (id INT, v STRING) PARTITIONED BY (bucket(2, id))")
    val srcDir = fresh("graft-sink-src-") + "/s"
    val src = SnapshotLog(spark, srcDir)
    src.append((0 until 8).map(i => (i, s"a$i")).toDF("id", "v"))
    val q = LogChangeFeed.readChangesStream(spark, srcDir)
      .writeStream
      .option("checkpointLocation", fresh("graft-sink-cat-ckpt-"))
      .toTable("gsink1.dst")
    q.processAllAvailable()
    src.append(Seq((100, "z")).toDF("id", "v"))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM gsink1.dst").head().getLong(0) == 9)
    val snap = SnapshotLog(spark, s"$root/dst").snapshot()
    assert(snap.partitions.values.forall(_.size == 1),
      "streamed files must carry the TABLE-declared bucket tuple")
    assert(snap.txns.nonEmpty,
      "per-epoch commits must record the exactly-once txn watermark")
  }

  test("refusals: partitionBy has no effect (layout is the table's); missing path") {
    val dstDir = fresh("graft-sink-dst-") + "/d"
    val feed = LogChangeFeed.readChangesStream(spark,
      { val d = fresh("graft-sink-src-") + "/s"
        val l = SnapshotLog(spark, d)
        l.append(Seq((1, "x")).toDF("id", "v")); d })
    // on the DSv2 provider path Spark DROPS partitionBy before the
    // sink ever sees it (same as every V2 format sink) — the contract
    // holds the other way around: the written layout is whatever the
    // TABLE declares, never the writer (the toTable case above pins
    // that); a writer-passed partitioning can therefore never corrupt
    // pruning
    val q = feed.writeStream.format("graft-log")
      .option("path", dstDir).partitionBy("id")
      .option("checkpointLocation", fresh("ck")).start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val snap = SnapshotLog(spark, dstDir).snapshot()
    assert(snap.partitionSpec.isEmpty && snap.rows == 1,
      "writer partitionBy must not invent a table layout")
    assertThrows[Exception](feed.writeStream.format("graft-log")
      .option("checkpointLocation", fresh("ck")).start())
  }
}
