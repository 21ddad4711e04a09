package graft.streaming

import graft.table.{LogAppendWrite, SnapshotLog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, Write, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Structured Streaming SINK into a [[SnapshotLog]] table —
  * `df.writeStream.format("graft-log").option("path", dir)` is the SQL
  * spelling of the exactly-once ingestion the typed API does through
  * `foreachBatch` + [[SnapshotLog.appendStream]]:
  *
  *  - '''Append mode''' commits each micro-batch as ONE transactional
  *    `append` version through the NATIVE DSv2 write tier
  *    ([[graft.table.LogAppendWrite]] — per-task rolling parquet
  *    writers, `RequiresDistributionAndOrdering` reporting the table's
  *    hidden partition transforms, driver commit = the shared manifest
  *    cores with footer stats/bloom lift).
  *  - '''Complete mode''' replaces the table atomically per batch
  *    ([[SnapshotLog.commitNativeOverwriteAllTxn]]) — the natural shape
  *    for a streaming aggregation materialized as a log table.
  *
  * Exactly-once rides the log's `(appId, batchId)` transaction
  * watermark, checked INSIDE the commit CAS: the appId defaults to the
  * streaming query's persistent id (the engine stamps it on the driver
  * thread under the `sql.streaming.queryId` local property, and it
  * survives restarts with the checkpoint), overridable with
  * `option("txnAppId", ...)` for multiplexed lanes. A replayed epoch
  * after crash recovery deletes its re-written task files and commits
  * nothing — the same contract every `appendStream` consumer already
  * has, behind the stock `writeStream` surface.
  *
  * `partitionBy(...)` is refused: a log table's layout is declared ON
  * the table (hidden partition transforms in the manifest), not per
  * writer — two writers disagreeing about layout would corrupt pruning.
  *
  * DSv2 `StreamingWrite` (the former V1 `Sink` and its
  * batch-frame bridge are retired): the distributed task writers are
  * the SAME native write path every batch `INSERT` runs, and the
  * per-epoch driver commit is one transactional manifest CAS. */
private[graft] final class LogSinkTable(dir: String, declared: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-log(`$dir`)"
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var complete = false
      // Complete mode arrives as truncate() — atomic replace per epoch
      override def truncate(): WriteBuilder = { complete = true; this }
      override def build(): Write = LogAppendWrite.build(
        SnapshotLog.inheriting(SparkSession.active, dir), info,
        if (complete) LogAppendWrite.OverwriteAll else LogAppendWrite.Append)
    }
}

/** `writeStream.format("graft-log")` — the DSv2 provider (TableProvider
  * replaced the former V1 StreamSinkProvider; short name, options and
  * the exactly-once watermark are unchanged, so existing checkpoints
  * keep resuming). */
class LogStreamSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  private def dir(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-log sink needs option(\"path\", <table dir>)"))

  /** The committed schema when the destination exists (a restarted
    * pipeline), else empty — the sink accepts whatever the query
    * produces, and the log's own schema-merge gate arbitrates. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val log = SnapshotLog(SparkSession.active, dir(options))
    if (log.currentVersion() > 0) log.read().schema else new StructType()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitioning.isEmpty,
      "graft-log: layout is declared on the TABLE (hidden partition " +
        "transforms in the manifest), not per writer — drop partitionBy")
    new LogSinkTable(
      dir(new CaseInsensitiveStringMap(properties)), schema)
  }
}
