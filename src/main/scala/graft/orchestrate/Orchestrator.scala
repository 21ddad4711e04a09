package graft.orchestrate

import graft.catalog.CatalogRegistrar
import graft.config.PipelineConfig
import graft.jobs.{JobMetrics, PreparedLayerJob, RawLayerJob}
import graft.ledger.{LocalJsonLedger, RunLedger, RunState}
import graft.sources.SourceReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ties the layers together: raw ingest → ledger → promotion → catalog.
  *
  * Two promotion paths, same job code:
  *  - [[drain]] — synchronous, the tested truth (SURVEY §7.5).
  *  - [[watch]] — event-driven: a Structured Streaming file source over
  *    the ledger directory plays the reference's DynamoDB stream, and
  *    `foreachBatch` plays the Lambda that starts the prepared job per
  *    `RAW COMPLETED` insert (reference: lambda/invoke_prepared.py:7-38;
  *    stream wiring at
  *    aws_genaric_datapipeline/aws_genaric_datapipeline_stack.py:80-83).
  */
object Orchestrator {

  /** Run one raw ingestion (reference trigger → raw job, SURVEY §3.2). */
  def ingest(spark: SparkSession, cfg: PipelineConfig, source: SourceReader,
      ledger: RunLedger, runId: String): JobMetrics =
    RawLayerJob.run(spark, cfg, source, ledger, runId)

  /** Synchronously promote everything pending, register the catalog table.
    * Idempotent: drain twice ≡ drain once. */
  def drain(spark: SparkSession, cfg: PipelineConfig, ledger: RunLedger): Seq[JobMetrics] = {
    val promoted = PreparedLayerJob.promoteAll(spark, cfg, ledger)
    if (promoted.nonEmpty) CatalogRegistrar.register(spark, cfg)
    promoted
  }

  /** Full medallion pass for one pipeline: ingest + drain + catalog.
    * Exercises SURVEY §2.1 ops #1-9/#13-15 in one call (§7.2). */
  def runEndToEnd(spark: SparkSession, cfg: PipelineConfig, source: SourceReader,
      ledger: RunLedger, runId: String): String = {
    ingest(spark, cfg, source, ledger, runId)
    drain(spark, cfg, ledger)
    CatalogRegistrar.register(spark, cfg)
  }

  /** Event-driven promotion: watch the ledger directory as a stream; for
    * each batch containing new RAW COMPLETED inserts, run the prepared job.
    * `foreachBatch` sees only *new* files (the stream's exactly-once file
    * tracking), and `promoteAll` is itself idempotent, so replays are safe.
    */
  def watch(spark: SparkSession, cfg: PipelineConfig, ledger: LocalJsonLedger,
      checkpointDir: String): StreamingQuery = {
    val inserts = spark.readStream
      .schema(graft.ledger.RunLedger.schema)
      .json(ledger.dir.toString)
      .filter(col("state") === RunState.RawCompleted &&
        col("job_src") === cfg.jobSrc)
    inserts.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          PreparedLayerJob.promoteAll(spark, cfg, ledger)
          CatalogRegistrar.register(spark, cfg)
        }
        ()
      }
      .start()
  }
}
