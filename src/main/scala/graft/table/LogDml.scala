package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, Project, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col

/** `MERGE INTO` for [[SnapshotLog]] tables mounted through
  * [[GraftTableCatalog]] — the SQL spelling of [[SnapshotLog.mergeByKey]],
  * installed as a resolution rule by [[graft.plans.GraftExtensions]]
  * (the same extension-point production lakehouse formats use for their
  * MERGE: intercept the analyzed [[MergeIntoTable]] before Spark's
  * row-level-operation rewrite, and route it to the format's own
  * transactional upsert).
  *
  * Supported shape — the canonical key'd upsert, which is EXACTLY
  * `mergeByKey`'s semantics:
  * {{{
  * MERGE INTO graft.t USING <source> s
  *   ON t.k = s.k                       -- one equality, same column name
  * WHEN MATCHED THEN UPDATE SET *       -- whole row from the source
  * WHEN NOT MATCHED THEN INSERT *       -- whole row from the source
  * }}}
  * Both the pre-expansion star actions and the analyzer-expanded
  * per-column assignment form are recognized (the resolution batch runs
  * to fixpoint, so the rule may see either). Any other shape —
  * conditional actions, partial-column updates, `WHEN NOT MATCHED BY
  * SOURCE`, delete actions — is left for Spark to refuse with its own
  * row-level-operations error; the typed API covers those cases.
  *
  * The rewrite targets the LIVE head: the command re-resolves the
  * table's log at execution and commits through `mergeByKey`'s
  * stats-targeted copy-on-write path (per-key file routing, CDC images
  * on feed-enabled tables, one CAS'd manifest). SQL MERGE requires each
  * target row to match at most ONE source row — enforced with a
  * batch-sized duplicate probe before anything stages. */
final class MergeIntoLogRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case m: MergeIntoTable => rewrite(m).getOrElse(m)
  }

  private def rewrite(m: MergeIntoTable): Option[LogicalPlan] = {
    val target = EliminateSubqueryAliases(m.targetTable) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[LogTable] => r
      case _ => return None
    }
    if (!m.sourceTable.resolved || m.notMatchedBySourceActions.nonEmpty)
      return None
    val key = keyOf(m.mergeCondition, target).getOrElse(return None)
    if (!wholeRowAction(m.matchedActions, isUpdate = true, target) ||
        !wholeRowAction(m.notMatchedActions, isUpdate = false, target))
      return None
    // project the source onto the target's columns BY NAME (casting
    // where widening is needed) — the key-unique whole-row batch
    // mergeByKey takes
    val projected = target.output.map { t =>
      val s = m.sourceTable.output.find(a => conf.resolver(a.name, t.name))
        .getOrElse(return None)
      val e: Expression =
        if (s.dataType == t.dataType) s else Cast(s, t.dataType)
      Alias(e, t.name)(): NamedExpression
    }
    val table = target.table.asInstanceOf[LogTable]
    Some(MergeIntoLogCommand(table.log.tableDir, key,
      Project(projected, m.sourceTable)))
  }

  /** The merge key iff the condition is ONE equality between a target
    * attribute and a source attribute of the SAME name. */
  private def keyOf(cond: Expression,
      target: DataSourceV2Relation): Option[String] = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference)
        if conf.resolver(a.name, b.name) =>
      val tgt = target.outputSet
      if (tgt.contains(a) ^ tgt.contains(b)) // one side each
        Some(if (tgt.contains(a)) a.name else b.name)
      else None
    case _ => None
  }

  /** True iff `actions` is exactly one unconditional whole-row-from-
    * source action: the star form, or its analyzer expansion (every
    * target column assigned the same-named source column). */
  private def wholeRowAction(actions: Seq[MergeAction], isUpdate: Boolean,
      target: DataSourceV2Relation): Boolean = actions match {
    case Seq(UpdateStarAction(None)) => isUpdate
    case Seq(InsertStarAction(None)) => !isUpdate
    case Seq(UpdateAction(None, assigns, _)) if isUpdate =>
      wholeRowAssignments(assigns, target)
    case Seq(InsertAction(None, assigns)) if !isUpdate =>
      wholeRowAssignments(assigns, target)
    case _ => false
  }

  private def wholeRowAssignments(assigns: Seq[Assignment],
      target: DataSourceV2Relation): Boolean =
    assigns.length == target.output.length &&
      target.output.forall { t =>
        assigns.exists { a =>
          val keyMatches = a.key match {
            case k: AttributeReference => conf.resolver(k.name, t.name)
            case _                     => false
          }
          val valueFromSource = stripCast(a.value) match {
            case v: AttributeReference =>
              conf.resolver(v.name, t.name) && !target.outputSet.contains(v)
            case _ => false
          }
          keyMatches && valueFromSource
        }
      }

  /** Alignment may interpose a widening cast on an assignment value —
    * the underlying source attribute is what the shape check needs. */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other   => other
  }
}

/** The executable MERGE: a driver-side command (the batch itself is a
  * fully distributed upsert inside [[SnapshotLog.mergeByKey]] — staging
  * write, anti-join, stats lift; only the commit decision is local,
  * like every log commit). */
final case class MergeIntoLogCommand(tableDir: String, key: String,
    source: LogicalPlan) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val updates = org.apache.spark.sql.GraftBridge.ofRows(spark, source)
      .localCheckpoint(true) // feeds the dup probe AND the merge once
    try {
      // SQL MERGE semantics: a target row may match at most one source
      // row — also exactly mergeByKey's key-uniqueness contract
      val dup = updates.groupBy(col(key)).count()
        .where(col("count") > 1).limit(1).collect()
      if (dup.nonEmpty) throw new IllegalStateException(
        s"MERGE INTO $tableDir: source has multiple rows for key " +
          s"$key = ${dup.head.get(0)} — each target row may match at " +
          "most one source row (dedupe the source, e.g. latest-wins)")
      SnapshotLog.inheriting(spark, tableDir).mergeByKey(updates, key)
    } finally updates.unpersist()
    Seq.empty
  }
}
