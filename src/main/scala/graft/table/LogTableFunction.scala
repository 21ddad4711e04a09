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
  * pushdown — identically to `FROM graft.t`, including over snapshots
  * with PENDING merge-on-read debt: the builder plans [[LogDebtScan]]
  * there, which prunes candidates from the manifest and composes the
  * tombstone/vector/alignment debt on the survivors.
  */
object LogTableFunction {

  /** The `injectTableFunction` description tuple. */
  def description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_log"),
      new ExpressionInfo(getClass.getName.stripSuffix("$"), "graft_log"),
      build _)

  /** First-arg contract shared by both functions: a string-literal
    * table directory. */
  private def pathOf(fn: String, args: Seq[Expression]): String =
    args.head match {
      case e if e.foldable && e.dataType ==
          org.apache.spark.sql.types.StringType =>
        e.eval().toString
      case other => throw new IllegalArgumentException(
        s"$fn path must be a string literal, got $other")
    }

  /** A version argument: an integer version, a NAMED TAG (explicit user
    * refs win), or an ISO-instant / UTC wall-clock string resolved
    * through the manifests' commit clocks — the TVF spelling of the
    * catalog's VERSION/TIMESTAMP AS OF. */
  private def versionArg(fn: String, log: SnapshotLog,
      e: Expression): Long = e match {
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
      val t = e.eval().toString.trim
      log.versionOfTag(t).getOrElse {
        val instant = scala.util.Try(java.time.Instant.parse(t))
          .orElse(scala.util.Try(java.time.LocalDateTime
            .parse(t.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC)))
          .getOrElse(throw new IllegalArgumentException(
            s"$fn: '$t' is neither an integer version, a tag, " +
              "nor a parseable timestamp (ISO instant or " +
              "'yyyy-MM-dd HH:mm:ss' UTC)"))
        log.versionAt(instant.toEpochMilli)
      }
    case other => throw new IllegalArgumentException(
      s"$fn version must be an integer or timestamp-string literal, got $other")
  }

  private def build(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      s"graft_log takes (path [, version]), got ${args.size} arguments")
    val path = pathOf("graft_log", args)
    val spark = SparkSession.active
    val main = SnapshotLog(spark, path)
    // 'branch:<name>' reads a WRITE-AUDIT-PUBLISH branch's head — the
    // audit half of the WAP loop in pure SQL (the branch is its own
    // chain, so the ordinary version/tag/timestamp forms below always
    // address MAIN)
    val branchOf = args.lift(1).collect {
      case e if e.foldable &&
          e.dataType == org.apache.spark.sql.types.StringType &&
          e.eval().toString.trim.startsWith("branch:") =>
        e.eval().toString.trim.stripPrefix("branch:")
    }
    val log = branchOf.fold(main)(main.branch)
    val version = if (branchOf.isDefined) -1L
      else args.lift(1).map(versionArg("graft_log", log, _)).getOrElse(-1L)
    val snap = log.snapshot(version) // resolve -1 → head ONCE, here
    // the DSv2 relation: WHERE clauses reach LogScanBuilder before
    // planning, so selective predicates open 1-of-N files (manifest
    // stats/partition/bloom gates), exactly like the catalog path.
    // Merge-on-read debt (tombstones/DVs/rename epochs) no longer
    // forfeits pruning: the builder plans [[LogDebtScan]], which
    // prunes candidates from the manifest and composes the debt on
    // the survivors.
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty, new org.apache.hadoop.fs.Path(path).getName)
    org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
      .create(new LogTable(log, ident, snap.version), None, None)
  }

  /** The `injectTableFunction` description tuple for
    * `graft_log_changes` — the SQL spelling of
    * [[SnapshotLog.readChangeRows]] (the `table_changes` pattern):
    * {{{
    * SELECT * FROM graft_log_changes('/lake/t', 2)           -- (2, head]
    * SELECT * FROM graft_log_changes('/lake/t', 2, 5)        -- (2, 5]
    * SELECT * FROM graft_log_changes('/lake/t', 'v2-tag', 5, true)
    * }}}
    * `from`/`to` take the SAME integer/tag/timestamp forms as
    * `graft_log`'s travel argument (`from` is EXCLUSIVE, matching the
    * typed feed's cursor contract — "changes after the version I
    * applied"); the optional boolean re-types merge/update pairs to
    * `update_preimage`/`update_postimage` (four-type CDF). The result
    * carries the table's columns plus `_change_type` and
    * `_commit_version`, and composes with every downstream SQL
    * construct. Cost is the feed's: O(changed rows) read, never
    * O(table). */
  def changesDescription: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_log_changes"),
      new ExpressionInfo(getClass.getName.stripSuffix("$"), "graft_log_changes"),
      buildChanges _)

  private def buildChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 2 && args.size <= 4,
      s"graft_log_changes takes (path, from [, to [, fourType]]), " +
        s"got ${args.size} arguments")
    val path = pathOf("graft_log_changes", args)
    val spark = SparkSession.active
    val log = SnapshotLog(spark, path)
    val from = versionArg("graft_log_changes", log, args(1))
    val to = args.lift(2)
      .map(versionArg("graft_log_changes", log, _)).getOrElse(-1L)
    val fourType = args.lift(3).map {
      case e if e.foldable &&
          e.dataType == org.apache.spark.sql.types.BooleanType =>
        e.eval().asInstanceOf[Boolean]
      case other => throw new IllegalArgumentException(
        s"graft_log_changes fourType must be a boolean literal, got $other")
    }.getOrElse(false)
    org.apache.spark.sql.GraftBridge.logicalPlan(
      log.readChangeRows(from, to, fourType))
  }
}
