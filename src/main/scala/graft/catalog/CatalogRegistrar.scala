package graft.catalog

import graft.config.PipelineConfig
import org.apache.spark.sql.SparkSession

/** Exposes a pipeline's prepared layer as a named, schema-declared
  * external table in the session catalog.
  *
  * Spark-native equivalent of the reference's Glue Catalog table synthesis
  * (reference: templates/cds_view_template.py:26-55): external parquet
  * table (reference :45-54), columns from the config schema (reference
  * :28-33), location = the stable prepared prefix (reference :46), all in
  * database `pipelines_db` (reference :38). In a real AWS deployment the
  * session catalog is Glue-backed and this is the same DDL; locally it is
  * the in-memory/Hive catalog.
  *
  * Log-backed pipelines ([[PipelineConfig.useLog]]) register a VIEW over
  * the CURRENT snapshot's exact file set instead of a location-scoped
  * table: the data directory of a log table also holds files that are
  * staged-but-uncommitted or already replaced (until vacuum), so a
  * directory-location table would read phantom rows. The view pins the
  * committed manifest's files; every drain re-registers, so the name
  * tracks the log head. Production plugs the log in as a DataSource V2
  * catalog (one class, same manifest read) — the view is the
  * session-catalog rendering of the same idea, view text O(live files)
  * exactly like the manifest it mirrors.
  */
object CatalogRegistrar {
  val Database = "pipelines_db"

  private def quote(id: String): String = s"`${id.replace("`", "``")}`"

  /** CREATE EXTERNAL TABLE pipelines_db.{name} (...) USING parquet
    * LOCATION '{preparedPath}' — or, for log-backed pipelines, CREATE
    * VIEW over the current snapshot's files. Idempotent (drop +
    * recreate: the table/view is external, data is never touched), and
    * safe across a table_format switch (whichever object type currently
    * holds the name is dropped first). Returns the fully-qualified name.
    */
  def register(spark: SparkSession, cfg: PipelineConfig): String = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${quote(Database)}")
    val fqn = s"${quote(Database)}.${quote(cfg.tableName)}"
    dropExisting(spark, fqn, cfg.tableName)
    if (cfg.useLog) {
      val snap = graft.table.PreparedTable.log(spark, cfg).snapshot()
      val glob = s"${cfg.preparedPath}/${graft.table.SnapshotLog.DataDirName}/" +
        s"{${snap.files.mkString(",")}}"
      spark.sql(s"CREATE VIEW $fqn AS SELECT * FROM parquet.${quote(glob)}")
    } else {
      // Prepared rows carry the audit column on top of the declared schema
      // (reference: glue src/raw_layer_job.py:53).
      val cols = (cfg.schema.map(c => s"${quote(c.name)} ${c.tpe} COMMENT '${c.comment.replace("'", "''")}'") :+
        "`ETL_PART_KEY` string COMMENT 'ingestion run id'").mkString(", ")
      spark.sql(s"CREATE TABLE $fqn ($cols) USING parquet LOCATION '${cfg.preparedPath}'")
    }
    s"$Database.${cfg.tableName}"
  }

  /** Drop whatever object currently holds the name — DROP TABLE refuses
    * a view and vice versa, and a pipeline may switch table_format
    * between registrations. */
  private def dropExisting(spark: SparkSession, fqn: String, name: String): Unit =
    if (spark.catalog.tableExists(fqn)) {
      if (spark.catalog.getTable(fqn).tableType == "VIEW")
        spark.sql(s"DROP VIEW IF EXISTS $fqn")
      else
        spark.sql(s"DROP TABLE IF EXISTS $fqn")
    }
}
