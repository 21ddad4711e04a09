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
  */
object CatalogRegistrar {
  val Database = "pipelines_db"

  private def quote(id: String): String = s"`${id.replace("`", "``")}`"

  /** CREATE EXTERNAL TABLE pipelines_db.{name} (...) USING parquet
    * LOCATION '{preparedPath}'. Idempotent (drop + recreate: the table is
    * external, so data is never touched). Returns the fully-qualified name.
    */
  def register(spark: SparkSession, cfg: PipelineConfig): String = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${quote(Database)}")
    val fqn = s"${quote(Database)}.${quote(cfg.tableName)}"
    // Prepared rows carry the audit column on top of the declared schema
    // (reference: glue src/raw_layer_job.py:53).
    val cols = (cfg.schema.map(c => s"${quote(c.name)} ${c.tpe} COMMENT '${c.comment.replace("'", "''")}'") :+
      "`ETL_PART_KEY` string COMMENT 'ingestion run id'").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn ($cols) USING parquet LOCATION '${cfg.preparedPath}'")
    s"$Database.${cfg.tableName}"
  }
}
