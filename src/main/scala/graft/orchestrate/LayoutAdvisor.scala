package graft.orchestrate

import graft.config.LayoutPolicy
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryComparison, EqualTo, In, InSet, Literal}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, NumericType, ShortType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Scan telemetry → layout recommendation: the observe half of the
  * maintenance loop whose act half is [[graft.jobs.LayoutJob]].
  *
  * The right cluster columns are whatever columns the QUERY WORKLOAD
  * filters on — something no single pipeline run can know. This listener
  * (a stock `QueryExecutionListener`, registered per session) watches
  * every successful query's physical plan, and for each parquet scan
  * records which columns appeared in pushable comparison predicates
  * (`dataFilters` — partition filters are excluded on purpose: the
  * partition key is already pruned by the catalog, layout buys it
  * nothing). [[advise]] then turns the tallies for a table path into a
  * [[LayoutPolicy]]: the hottest column lexicographic, the top two
  * Z-ordered when the runner-up carries comparable weight (≥ half the
  * leader's count) and both are range-typed — mirroring the measured
  * trade-off (BASELINE.md "Layout payoff"): a distant-second column
  * isn't worth halving the leader's skipping power for.
  *
  * Driver-side only and O(tables × columns) memory: one counter per
  * (path, column). Nothing touches the data plane. At 100 TB scale the
  * same tallies come from the warehouse's query-log ETL instead of one
  * session's listener; the decision rule is unchanged. The advisor
  * RECOMMENDS — the config's declared `cluster_by` stays the source of
  * truth the orchestrator acts on, so a human (or a policy job diffing
  * advice against configs) stays in the loop for a rewrite that touches
  * every byte of a layer.
  */
final class LayoutAdvisor extends QueryExecutionListener {
  private val counts = new ConcurrentHashMap[(String, String), java.lang.Long]()
  // equality/IN probes tallied separately: a point lookup wants a BLOOM,
  // not a sort order — range clustering serves it only on the leader
  private val eqCounts = new ConcurrentHashMap[(String, String), java.lang.Long]()

  def install(spark: SparkSession): this.type = {
    spark.listenerManager.register(this)
    this
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(qe.executedPlan)

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

  /** Tally each scan's filtered columns (once per column per scan, so a
    * BETWEEN — two comparisons — counts one vote like a one-sided cut).
    * Public: a query-log replay job can feed archived plans through the
    * same tally without a live listener. */
  def record(plan: SparkPlan): Unit =
    scans(plan).foreach { s =>
      val roots = s.relation.location.rootPaths
      // scans fed an explicit FILE list (a log table's snapshot read, a
      // pinned-manifest catalog view) tally under their common parent —
      // the table's data directory — so per-table counts aggregate
      // across snapshots; directory-rooted scans key by the directory
      val root = roots.headOption.map { p =>
        if (roots.lengthCompare(1) > 0 || p.getName.endsWith(".parquet"))
          p.getParent.toString
        else p.toString
      }.getOrElse("")
      val cols = s.dataFilters.flatMap(_.collect {
        case c: BinaryComparison => (c.left, c.right) match {
          case (a: AttributeReference, _: Literal) => Some(a.name)
          case (_: Literal, a: AttributeReference) => Some(a.name)
          case _ => None
        }
      }.flatten).toSet
      cols.foreach(c => counts.merge((root, c), 1L, (a, b) => a + b))
      val eqCols = s.dataFilters.flatMap(_.collect {
        case EqualTo(a: AttributeReference, _: Literal) => Some(a.name)
        case EqualTo(_: Literal, a: AttributeReference) => Some(a.name)
        case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
          Some(a.name)
        case i: InSet => i.child match {
          case a: AttributeReference => Some(a.name)
          case _ => None
        }
      }.flatten).toSet
      eqCols.foreach(c => eqCounts.merge((root, c), 1L, (a, b) => a + b))
    }

  /** AQE wraps stages; descend to the real scans wherever they sit. */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  /** Predicate-column tallies observed so far, keyed by (path, column). */
  def predicateCounts: Map[(String, String), Long] =
    counts.asScala.map { case (k, v) => k -> v.longValue() }.toMap

  /** Recommend a layout for `rootPath`, or None if no predicate on a
    * schema column was ever observed there. */
  def advise(rootPath: String, schema: StructType): Option[LayoutPolicy] = {
    val known = schema.fieldNames.toSet
    val ranked = predicateCounts.collect {
      case ((p, col), n) if p == rootPath && known(col) => col -> n
    }.toSeq.sortBy { case (col, n) => (-n, col) }
    // types LayoutJob can rank-bucket AND parquet keeps min/max stats
    // for: numerics/timestamps via approxQuantile, strings via the
    // binary-ordered sample (zorderBy's string path)
    def rangeTyped(col: String): Boolean = schema(col).dataType match {
      case _: NumericType | TimestampType | DateType | StringType => true
      case _ => false
    }
    ranked match {
      case Seq() => None
      case (c1, n1) +: (c2, n2) +: _
          if n2 * 2 >= n1 && rangeTyped(c1) && rangeTyped(c2) =>
        Some(LayoutPolicy(Seq(c1, c2), zorder = true))
      case (c1, _) +: _ => Some(LayoutPolicy(Seq(c1)))
    }
  }

  /** Recommend bloom columns for `rootPath`: the columns the workload
    * probes by EQUALITY or IN — point lookups — that the advised layout
    * does not already serve (the cluster columns get range-stat
    * skipping; a bloom there is redundant) and that blooms can index
    * (integral or string — [[graft.table.FileBlooms]]'s contract). At
    * most two, ranked by probe count: each bloom costs a narrow scan
    * per commit, so the advisor only nominates what the workload
    * actually hits. */
  def adviseBlooms(rootPath: String, schema: StructType): Seq[String] = {
    val known = schema.fieldNames.toSet
    val layoutCols = advise(rootPath, schema).map(_.columns.toSet)
      .getOrElse(Set.empty[String])
    def bloomTyped(c: String): Boolean = schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    eqCounts.asScala.collect {
      case ((p, c), n) if p == rootPath && known(c) && bloomTyped(c) &&
        !layoutCols(c) => c -> n.longValue()
    }.toSeq.sortBy { case (c, n) => (-n, c) }.take(2).map(_._1)
  }
}
