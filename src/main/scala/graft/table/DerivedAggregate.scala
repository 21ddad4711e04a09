package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** One maintained column of a [[DerivedAggregate]]: `out` is the column
  * name in the derived table, `fn` the aggregate (`count` | `sum` |
  * `min` | `max`), `in` the base-table input column (ignored for
  * `count`). Only DECOMPOSABLE aggregates belong here — ones whose
  * partial states merge associatively (count merges by sum, sum by sum,
  * min by min, max by max) — because incremental maintenance IS partial
  * aggregation: the delta's partial folds into the stored state without
  * touching base rows already consumed. `avg` is `sum`+`count` composed
  * at read time; exact `count distinct` is NOT decomposable (its state
  * is the value set) and is rejected at construction. */
final case class AggCol(out: String, fn: String, in: String = "") {
  require(Set("count", "sum", "min", "max")(fn),
    s"'$fn' is not a decomposable aggregate (count/sum/min/max)")

  /** The aggregate over raw base rows (the delta's partial). */
  private[table] def partial: Column = (fn match {
    case "count" => count(lit(1))
    case "sum"   => sum(col(in))
    case "min"   => min(col(in))
    case "max"   => max(col(in))
  }).as(out)

  /** The merge of already-partial states (stored row ∪ delta partial). */
  private[table] def merge: Column = (fn match {
    case "count" | "sum" => sum(col(out))
    case "min"           => min(col(out))
    case "max"           => max(col(out))
  }).as(out)
}

/** An incrementally-maintained aggregate table (materialized rollup)
  * over a [[SnapshotLog]] base table: `derived` always equals
  * `base.groupBy(key).agg(...)` as of some base version, and
  * [[refresh]] advances it by folding ONLY the base's change feed since
  * the last refresh — O(new data) + O(touched keys), never a base
  * rescan. The downstream story that makes the change feed load-bearing:
  * at 100 TB a nightly dashboard rollup or per-domain corpus accounting
  * recomputed from scratch costs a full-table shuffle per refresh;
  * maintained through the feed it costs one pass over the day's appends.
  *
  * Exactly-once without a side cursor: the base version consumed is
  * recorded in the DERIVED table's own `txns` watermark (lane
  * `derive:<base dir>`) inside the very commit that applies the delta —
  * [[SnapshotLog.mergeByKey]]'s `txn` parameter, the same contract
  * streaming ingestion and [[LogMirror]] ride. A crash between "applied"
  * and "recorded", a rerun, or two racing refreshers all converge: the
  * replay is detected inside the commit path and applies nothing.
  *
  * Change-commit policy (same as [[graft.streaming.LogChangeFeed]]):
  * row-preserving rewrites (`compact`/`cluster`/`zorder`) contribute no
  * delta and fold through silently; a row-REMOVING base commit
  * (`delete`/`merge`/`delete_keys`/`restore`) fails the refresh — the
  * stored aggregates may count rows that no longer exist, and no
  * insert-only delta can subtract them. [[fullRefresh]] is the resync:
  * recompute from the base's current snapshot and REPLACE the derived
  * state, re-anchoring the watermark.
  *
  * Scale shape: the delta partial is one map-side-combinable shuffle of
  * the new files only; the merge touches just the derived files holding
  * updated keys ([[SnapshotLog.mergeByKey]]'s per-key routing + stats/
  * bloom pruning), and the derived table is key-unique by construction
  * so it stays proportional to group cardinality, not corpus size.
  * NULL group keys are excluded (the merge's key routing requires
  * non-null keys; SQL GROUP BY would keep a NULL group — documented
  * divergence, matching what a partitioned rollup table can index). */
final class DerivedAggregate(base: SnapshotLog, derived: SnapshotLog,
    key: String, aggs: Seq[AggCol]) {
  require(aggs.nonEmpty, "a derived aggregate needs at least one AggCol")
  require(aggs.map(_.out).distinct.size == aggs.size,
    s"duplicate output columns: ${aggs.map(_.out)}")
  require(!aggs.exists(_.out == key), "an AggCol cannot shadow the group key")

  private val RowRemoving = Set("delete", "merge", "delete_keys", "restore")

  /** The change-feed lane this view consumes under — one watermark per
    * (base table, derived table) pair, stable across reruns. */
  private[table] def lane: String = s"derive:${base.tableDir}"

  /** The base version the derived state currently reflects (0 = never
    * refreshed). */
  def appliedVersion(): Long =
    if (derived.currentVersion() == 0) 0L
    else derived.snapshot().txns.getOrElse(lane, 0L)

  /** Fold every base commit since [[appliedVersion]] into the derived
    * table. Returns the new derived snapshot, or None when there was
    * nothing to apply (already current, or only physical rewrites
    * trailing the last append — re-walked and re-skipped by the next
    * refresh, the same harmless tail as [[LogMirror]]). */
  def refresh(): Option[Snapshot] = {
    val baseCur = base.currentVersion()
    val applied = appliedVersion()
    if (baseCur <= applied) return None
    val deltas = base.changes(applied, baseCur)
    val removing = deltas.filter(d => RowRemoving(d.op))
    if (removing.nonEmpty) throw new IllegalStateException(
      s"base ${base.tableDir} v${removing.head.version} is a " +
        s"'${removing.head.op}': stored aggregates may include rows it " +
        "removed, and an insert-only delta cannot subtract them — " +
        "resync with fullRefresh()")
    // only append versions ship rows; a physical-rewrite-only tail has
    // nothing to fold (and an empty batch has no keys to merge-route)
    if (!deltas.exists(d => d.op == "append" && d.addedFiles.nonEmpty))
      return None
    val partial = base.readAdded(deltas, baseCur)
      .where(col(key).isNotNull)
      .groupBy(col(key)).agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    if (derived.currentVersion() == 0)
      derived.appendStream(partial, lane, baseCur)
    else {
      // merge = stored rows for touched keys ∪ delta partials, re-folded
      // with each aggregate's MERGE function; untouched keys never load
      val stored = derived.read()
        .join(partial.select(col(key)), Seq(key), "left_semi")
      val combined = stored.unionByName(partial)
        .groupBy(col(key)).agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
      Some(derived.mergeByKey(combined, key, Some((lane, baseCur))))
    }
  }

  /** Resync after a row-removing base commit: recompute the aggregate
    * from the base's CURRENT snapshot and commit it as a full rewrite of
    * the derived table, watermark re-anchored at that base version.
    * O(base) by construction — exactly the cost [[refresh]] avoids. */
  def fullRefresh(): Snapshot = {
    val baseCur = base.currentVersion()
    val full = base.read()
      .where(col(key).isNotNull)
      .groupBy(col(key)).agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    if (derived.currentVersion() == 0) {
      derived.appendStream(full, lane, baseCur)
        .getOrElse(derived.snapshot())
    } else {
      // replace-all merge: every stored key is either updated or, if it
      // vanished from the base, must drop — mergeByKey only upserts, so
      // stale keys are deleted first via the merge-on-read tombstone
      // path, then materialized by the merge's rewrite of covered files
      val liveKeys = full.select(col(key))
      val stale = derived.read().select(col(key))
        .join(liveKeys, Seq(key), "left_anti")
      derived.deleteKeys(key, stale)
      derived.compact()
      derived.mergeByKey(full, key, Some((lane, baseCur)))
    }
  }
}

object DerivedAggregate {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.pmod

  /** Once-per-JVM fixture for [[mvIncremental]]: the events table
    * committed as THREE appends (split on `user_id % 3`) with a
    * compaction between the second and third, and the derived rollup
    * REFRESHED AFTER EVERY APPEND — so the graded state is the product
    * of three genuine incremental folds (initial build, one merge, one
    * merge across a physical rewrite that must contribute nothing),
    * never a single recompute. Memoized like the feed fixture
    * ([[graft.streaming.LogChangeFeed]]). */
  private val mvFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def eventsRollup(spark: SparkSession, dir: String): String =
    mvFixtures.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-mv-events-")
      val baseDir = tmp.resolve("base").toString
      val derivedDir = tmp.resolve("rollup").toString
      val events = graft.ops.Relational.events(spark, dir)
      val base = SnapshotLog(spark, baseDir)
      val mv = new DerivedAggregate(base, SnapshotLog(spark, derivedDir),
        "event_type", Seq(
          AggCol("n_events", "count"),
          AggCol("sum_value", "sum", "value_dec"),
          AggCol("min_value", "min", "value"),
          AggCol("max_value", "max", "value")))
      (0 until 3).foreach { slice =>
        base.append(events
          .withColumn("value_dec", col("value").cast("decimal(28,6)"))
          .where(pmod(col("user_id"), lit(3L)) === slice))
        if (slice == 1) base.rewrite("compact")(_.coalesce(1))
        mv.refresh()
      }
      derivedDir
    })

  /** Graded entry: the incrementally-maintained per-type rollup read
    * straight from the derived table — three change-feed folds deep.
    * The oracle recomputes the same aggregate from the raw events
    * table, so any drift in the partial/merge algebra, a double-folded
    * batch, a missed version, or a rewrite leaking rows into the feed
    * all hash-mismatch. The exact sum rides a decimal partial (stored
    * decimal, cast to double only at the graded edge) — incremental
    * folding must not inherit double addition's order dependence. */
  def mvIncremental(spark: SparkSession, dir: String): DataFrame = {
    val derivedDir = eventsRollup(spark, dir)
    SnapshotLog(spark, derivedDir).read()
      .select(col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"),
        col("min_value"), col("max_value"))
      .orderBy(col("event_type"))
  }

  def mvIncrementalOracle: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
      |       min(value) AS min_value, max(value) AS max_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
