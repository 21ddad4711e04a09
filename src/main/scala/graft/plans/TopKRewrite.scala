package graft.plans

import graft.plans.TopKPerGroup.TopKPerGroupPlan
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite — the §7.4 `Rule[LogicalPlan]` tier: detects the
  * universal window-function top-k idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(Window.partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k)
  *     .drop("rn")
  * }}}
  *
  * and replaces it with the bounded-heap [[TopKPerGroup]] operator, so a
  * user writing the stock idiom gets the partial/final heap plan (shuffle
  * ≤ k·groups·partitions rows, no per-group sort) without knowing the
  * custom operator exists. This is precisely what an optimizer rule is
  * for: the two formulations are semantically identical (same rows; ties
  * under a non-unique `order` are arbitrary in BOTH — `row_number` ties
  * are partition-order-dependent, the heap admits first-come), but the
  * physical cost differs by the full sort of every group.
  *
  * Matched shape (post-analysis, inside the operator-optimization batch):
  * `Project(attrs ⊆ child.output, Filter(cond, Window(row_number() as rn)))`
  * where
  *  - the Window computes EXACTLY ONE expression: `row_number()` over
  *    `ROWS UNBOUNDED PRECEDING .. CURRENT ROW` (row_number's only frame);
  *  - `cond` splits into one rank bound — `rn <= k`, `rn < k`, `rn = 1`
  *    (or the mirrored `k >= rn` / `k > rn`) — plus any number of
  *    conjuncts that don't reference `rn` (they're preserved as a Filter
  *    ABOVE the top-k, where the original Filter sat) and vacuous
  *    `isnotnull(rn)` conjuncts (row_number never returns null; the
  *    constraint-inference rule manufactures these);
  *  - the Project drops `rn` (a caller that keeps `rn` in its output
  *    needs the rank VALUES, which the heap operator does not produce).
  *
  * Guards: `k` must be a positive integer literal no larger than
  * `graft.topk.rewrite.maxK` (default 1000 — past that the k-row heaps
  * stop being "bounded" in any useful sense and the sort-based window is
  * the right plan); the per-task group-cardinality ceiling is inherited
  * from `graft.topk.maxGroupsPerTask` exactly as for the explicit API.
  *
  * Registration: fresh sessions via `spark.sql.extensions=
  * graft.plans.GraftExtensions`; live sessions via [[install]] /
  * [[uninstall]] (kept OUT of [[TopKPerGroup.install]] on purpose — the
  * explicit `topK` API must not silently re-plan unrelated window
  * queries in the same session as a side effect of being called once).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Ceiling on the literal k the rewrite will touch. */
  val MaxKConfKey = "graft.topk.rewrite.maxK"
  val DefaultMaxK = 1000

  /** Runtime kill switch (default on — registering the rule, via
    * `spark.sql.extensions` or [[install]], is already the opt-in act).
    * A session that wants row_number's partition-order tie admission on
    * a NON-unique order key — the one user-visible difference, both
    * formulations being arbitrary-but-plan-dependent there — can set
    * this false and keep the rest of the extension ladder. */
  val EnabledConfKey = "graft.topk.rewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan
  else plan.transformDown {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          part, ord, child, _)))
        if part.nonEmpty && // un-partitioned row_number is GLOBAL top-k:
          // TakeOrderedAndProject territory (and ClusteredDistribution
          // rejects an empty clustering) — leave it to Spark
          projectList.forall {
            case a: AttributeReference => child.outputSet.contains(a)
            case _ => false
          } =>
      val rn = alias.toAttribute
      rankBound(cond, rn) match {
        case Some((k, rest)) if k > 0 && k <= maxK &&
            rest.forall(!_.references.contains(rn)) =>
          val conf = org.apache.spark.sql.internal.SQLConf.get
          val maxGroups = conf
            .getConfString(TopKPerGroup.MaxGroupsConfKey,
              TopKPerGroup.DefaultMaxGroupsPerTask.toString).toInt
          // Spark's own InferWindowGroupLimit may already have inserted a
          // WindowGroupLimit under the Window (its sort-based rank-limit
          // pushdown, Spark 3.5+). The heap operator subsumes it — keep
          // it and the plan pays two redundant per-partition sorts below
          // the heaps. Strip it when it limits the SAME grouping/order to
          // at least k rows (a looser prefilter is safe to drop; a
          // stricter one would change results, so it stays).
          val realChild = child match {
            case WindowGroupLimit(p2, o2, _: RowNumber, limit, grandchild)
                if limit >= k && p2.length == part.length && o2.length == ord.length &&
                  p2.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
                  o2.zip(ord).forall { case (a, b) => a.semanticEquals(b) } =>
              grandchild
            case other => other
          }
          val topk = TopKPerGroupPlan(k, part, ord, maxGroups, realChild)
          Project(projectList,
            rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
        case _ => p
      }
  }

  private def maxK: Int = org.apache.spark.sql.internal.SQLConf.get
    .getConfString(MaxKConfKey, DefaultMaxK.toString).toInt

  private def enabled: Boolean = org.apache.spark.sql.internal.SQLConf.get
    .getConfString(EnabledConfKey, "true").toBoolean

  /** Splits `cond` into (k, remaining conjuncts): exactly one conjunct
    * must bound the rank attribute from above; vacuous `isnotnull(rn)`
    * conjuncts are discarded. None if no (or more than one) bound. */
  private def rankBound(cond: Expression, rn: Attribute): Option[(Int, Seq[Expression])] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    def asBound(e: Expression): Option[Int] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
      case EqualTo(Literal(1, _), a: Attribute) if a.semanticEquals(rn) => Some(1)
      case _ => None
    }
    val conjuncts = split(cond).filterNot {
      case IsNotNull(a: Attribute) => a.semanticEquals(rn) // row_number is never null
      case _ => false
    }
    val (bounds, rest) = conjuncts.partition(asBound(_).isDefined)
    bounds match {
      case Seq(b) => Some((asBound(b).get, rest))
      case _ => None
    }
  }

  /** Idempotent runtime registration (optimizer counterpart of
    * [[TopKPerGroup.install]]); also installs the planner strategy the
    * rewritten node needs. */
  def install(spark: SparkSession): Unit = {
    TopKPerGroup.install(spark)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  /** Removes the rewrite from a live session (the planner strategy stays
    * — it is inert without the logical node). */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq this)
}
