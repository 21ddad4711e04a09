package graft.streaming

import graft.table.SnapshotLog
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming SINK into a [[SnapshotLog]] table —
  * `df.writeStream.format("graft-log").option("path", dir)` is the SQL
  * spelling of the exactly-once ingestion the typed API does through
  * `foreachBatch` + [[SnapshotLog.appendStream]]:
  *
  *  - '''Append mode''' commits each micro-batch as ONE transactional
  *    `append` version through the staging choke point (hidden
  *    partition transforms, declared sort order, stats/bloom lift all
  *    apply — the handle inherits the table's declared maintenance
  *    from the manifest).
  *  - '''Complete mode''' replaces the table atomically per batch
  *    ([[SnapshotLog.overwriteAll]]) — the natural shape for a
  *    streaming aggregation materialized as a log table.
  *
  * Exactly-once rides the log's `(appId, batchId)` transaction
  * watermark, checked INSIDE the commit CAS: the appId defaults to the
  * streaming query's persistent id (the engine stamps it on the
  * driver thread under the `sql.streaming.queryId` local property, and
  * it survives restarts with the checkpoint), overridable with
  * `option("txnAppId", ...)` for multiplexed lanes. A replayed batch
  * after crash recovery commits nothing — the same contract every
  * `appendStream` consumer already has, now behind the stock
  * `writeStream` surface.
  *
  * `partitionBy(...)` is refused: a log table's layout is declared ON
  * the table (hidden partition transforms in the manifest), not per
  * writer — two writers disagreeing about layout would corrupt pruning.
  *
  * V1 `Sink` deliberately, like [[LogChangeFeedSource]]: `addBatch`
  * hands the whole micro-batch as a DataFrame, which IS the log's
  * commit unit — the distributed-DataWriter protocol would bypass the
  * one staging choke point for zero gain (the data write inside
  * `appendStream` is already fully distributed). */
final class LogStreamSink(dir: String, appIdOpt: Option[String],
    complete: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val appId = appIdOpt
      .orElse(Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId")))
      .getOrElse(s"graft-stream:$dir")
    // V1 Sink micro-batch frames are streaming-tagged relations a batch
    // write cannot plan — rebind the planned incremental RDD as a batch
    // frame (executed once, by appendStream's write job)
    val batch = org.apache.spark.sql.GraftBridge.asBatchFrame(data)
    val log = SnapshotLog.inheriting(spark, dir)
    if (complete) log.overwriteAll(batch, Some((appId, batchId)))
    else log.appendStream(batch, appId, batchId)
    ()
  }

  override def toString: String = s"LogStreamSink[$dir]"
}

class LogStreamSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  override def createSink(ctx: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-log: layout is declared on the TABLE (hidden partition " +
        "transforms in the manifest), not per writer — drop partitionBy")
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-log sink needs option(\"path\", <table dir>)"))
    val complete = outputMode == OutputMode.Complete()
    require(complete || outputMode == OutputMode.Append(),
      s"graft-log sink supports Append (transactional appends) and " +
        s"Complete (atomic replace per batch), got $outputMode")
    new LogStreamSink(dir, parameters.get("txnAppId"), complete)
  }
}
