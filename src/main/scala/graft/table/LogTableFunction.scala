package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `graft_log('<table dir>' [, version | 'timestamp'])` — the SQL
  * table-valued surface of [[SnapshotLog]]:
  * `SELECT * FROM graft_log('/lake/events')` reads the current
  * committed snapshot, `graft_log('/lake/events', 3)` time travels by
  * version, `graft_log('/lake/events', '2026-08-14T12:00:00Z')` by
  * commit wall-clock ([[SnapshotLog.versionAt]]), all composing with
  * every downstream SQL construct (joins, windows, CTEs) because the
  * function resolves to the SAME logical plan `SnapshotLog.read`
  * builds — one manifest GET, the committed file set, merge-on-read
  * tombstones applied, schema from the manifest. Installed by
  * [[graft.plans.GraftExtensions]] through
  * `SparkSessionExtensions.injectTableFunction`, the idiomatic Spark
  * hook for engine-level table functions (this is how `range` ships).
  *
  * Arguments must be literals (foldable) — they parameterize ANALYSIS,
  * not execution: the plan the query optimizes against IS the pinned
  * snapshot, so a concurrent commit cannot shear a half-planned query.
  *
  * The function resolves to the SAME pushdown-capable DataSource V2
  * relation the [[GraftTableCatalog]] builds ([[LogTable]] →
  * [[LogScanBuilder]]), so `FROM graft_log('/lake/t') WHERE day = X`
  * gets manifest-level FILE pruning — not just parquet row-group
  * pushdown — identically to `FROM graft.t`. The one divergence:
  * a snapshot with PENDING merge-on-read tombstones falls back to the
  * tombstone-applying composed plan (`SnapshotLog.read`) that the DSv2
  * scan deliberately refuses — correctness first, file pruning resumes
  * at the next compaction.
  */
object LogTableFunction {

  /** The `injectTableFunction` description tuple. */
  def description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_log"),
      new ExpressionInfo(getClass.getName.stripSuffix("$"), "graft_log"),
      build _)

  private def build(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      s"graft_log takes (path [, version]), got ${args.size} arguments")
    val path = args.head match {
      case e if e.foldable && e.dataType ==
          org.apache.spark.sql.types.StringType =>
        e.eval().toString
      case other => throw new IllegalArgumentException(
        s"graft_log path must be a string literal, got $other")
    }
    val spark = SparkSession.active
    val log = SnapshotLog(spark, path)
    val version = args.lift(1).map {
      case e if e.foldable && (e.dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => true
        case _ => false
      }) =>
        e.eval().asInstanceOf[Number].longValue()
      case e if e.foldable &&
          e.dataType == org.apache.spark.sql.types.StringType =>
        // string travel: a NAMED TAG first (explicit user refs win),
        // else an ISO instant or UTC-read wall-clock string resolved
        // through the manifests' commit clocks — the TVF spelling of
        // the catalog's VERSION/TIMESTAMP AS OF
        val t = e.eval().toString.trim
        log.versionOfTag(t).getOrElse {
          val instant = scala.util.Try(java.time.Instant.parse(t))
            .orElse(scala.util.Try(java.time.LocalDateTime
              .parse(t.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC)))
            .getOrElse(throw new IllegalArgumentException(
              s"graft_log: '$t' is neither an integer version, a tag, " +
                "nor a parseable timestamp (ISO instant or " +
                "'yyyy-MM-dd HH:mm:ss' UTC)"))
          log.versionAt(instant.toEpochMilli)
        }
      case other => throw new IllegalArgumentException(
        s"graft_log version must be an integer or timestamp-string literal, got $other")
    }.getOrElse(-1L)
    val snap = log.snapshot(version) // resolve -1 → head ONCE, here
    if (snap.tombstones.isEmpty && snap.dvs.isEmpty &&
        snap.fileSchemaIdx.isEmpty) {
      // the DSv2 relation: WHERE clauses reach LogScanBuilder before
      // planning, so selective predicates open 1-of-N files (manifest
      // stats/partition/bloom gates), exactly like the catalog path
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, new org.apache.hadoop.fs.Path(path).getName)
      org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        .create(new LogTable(log, ident, snap.version), None, None)
    } else // pending MoR tombstones/deletion vectors/rename debt: the
      // composed plan that applies them (anti-joins, field-id
      // alignment) — correctness first, manifest file pruning resumes
      // at the next materialization
      org.apache.spark.sql.GraftBridge.logicalPlan(log.read(version))
  }
}
