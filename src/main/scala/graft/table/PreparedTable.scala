package graft.table

import graft.config.PipelineConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for a pipeline's prepared layer under either configured
  * table format ([[PipelineConfig.tableFormat]]): the reference-shaped
  * bare append directory (default; reference:
  * glue src/prepared_layer_job.py:116-130) or the transaction-log table
  * ([[SnapshotLog]]) — same query surface, different physical contract
  * (atomic commits, exactly-once promotion, listing-free planning,
  * swap-window-free maintenance).
  */
object PreparedTable {

  /** The pipeline's log-backed prepared table (meaningful only when
    * `cfg.useLog`). Stats columns are the declared layout columns, so
    * the manifests record per-file ranges for exactly the columns
    * maintenance clusters — the pruning and the clustering halves of the
    * data-skipping story stay in lockstep. Bloom columns come from the
    * config (`prepared.bloom_columns`); the `extra*` seams are the
    * orchestrator's route for ADVISED columns (telemetry-nominated
    * stats and blooms) — a maintenance rewrite built with them indexes
    * the whole table retroactively, since every file re-stages. */
  def log(spark: SparkSession, cfg: PipelineConfig,
      extraBloomColumns: Seq[String] = Nil,
      extraStatsColumns: Seq[String] = Nil): SnapshotLog =
    new SnapshotLog(spark, cfg.preparedPath,
      (cfg.statsColumns ++ extraStatsColumns).distinct, None,
      (cfg.bloomColumns ++ extraBloomColumns).distinct,
      // declared hidden partitioning + write-time clustering: every
      // promotion (and every maintenance rewrite) routes through them;
      // change_feed turns on row-level CDC images for removals
      cfg.partitionBy, cfg.sortBy, cfg.changeFeed)

  /** Read the prepared table under the configured format: ONE manifest
    * GET for log tables (no directory listing, schema from the
    * manifest), a directory scan otherwise. */
  def read(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    if (cfg.useLog) log(spark, cfg).read()
    else spark.read.parquet(cfg.preparedPath)
}
