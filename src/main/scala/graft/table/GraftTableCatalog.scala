package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{And, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 catalog over a directory of [[SnapshotLog]] tables —
  * the production SQL integration the session-catalog view rendering
  * ([[graft.catalog.CatalogRegistrar]]) stands in for locally:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.root", "/lake/tables")
  * spark.sql("SELECT * FROM graft.events WHERE ts BETWEEN ... ")
  * spark.sql("SELECT * FROM graft.events VERSION AS OF 3")   // time travel
  * }}}
  *
  * Identifiers map to directories (`graft.ns.t` → `<root>/ns/t`); a
  * table is any directory with a committed manifest. Reads split the
  * work exactly as a lakehouse connector should: the MANIFEST decides
  * which files exist (one GET — no directory listing — plus stats /
  * partition-tuple / per-file-spec pruning via
  * [[SnapshotLog.filesMatching]], fed by the pushed-down filters), and
  * Spark's own vectorized `ParquetScan` executes over the surviving
  * file list (whole-stage codegen, row-group/page skipping — via
  * `GraftBridge.parquetBatchScan`, since the scan class is
  * `private[sql]`). Every pushed filter is ALSO returned as a residual,
  * so Spark re-evaluates exactly and the manifest gate only ever
  * REMOVES I/O, never rows. `VERSION AS OF` pins the snapshot through
  * the standard `loadTable(ident, version)` hook — the plan is built
  * against that version's file list, so a concurrent commit cannot
  * shear a running query.
  *
  * Deliberately read-only: writes are transactional commits with
  * staging, CAS and maintenance scheduling — the [[SnapshotLog]] API —
  * not blind INSERTs; `createTable`/`dropTable` name that API instead
  * of half-implementing it. Tables with PENDING merge-on-read
  * tombstones refuse the scan (a raw parquet read would resurrect
  * deleted rows): compact first, or read through the tombstone-applying
  * surfaces (`PreparedTable.read`, `graft_log(...)`).
  *
  * Scale: planning is one manifest GET + driver-side string compares;
  * execution is Spark's stock distributed parquet scan. Nothing here is
  * O(table) on the driver.
  */
final class GraftTableCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog '$name' needs spark.sql.catalog.$name.root = <directory of log tables>"))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (root +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  private def logFor(ident: Identifier): SnapshotLog =
    SnapshotLog(SparkSession.active, dirOf(ident))

  override def tableExists(ident: Identifier): Boolean =
    logFor(ident).currentVersion() > 0

  override def loadTable(ident: Identifier): Table = {
    val log = logFor(ident)
    if (log.currentVersion() == 0) throw new NoSuchTableException(ident)
    new LogTable(log, ident, -1L)
  }

  /** `VERSION AS OF <v>` — the snapshot pinned at plan time. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF on $catalogName takes a numeric log version, got '$version'")
    }
    val log = logFor(ident)
    if (log.currentVersion() == 0) throw new NoSuchTableException(ident)
    new LogTable(log, ident, v)
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands epoch MICROS; the manifest
    * commit clocks ([[Snapshot.ts]], millis) resolve the version. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val log = logFor(ident)
    if (log.currentVersion() == 0) throw new NoSuchTableException(ident)
    new LogTable(log, ident, log.versionAt(timestampMicros / 1000L))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val spark = SparkSession.active
    val base = new Path((root +: namespace.toSeq).mkString("/"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(base).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, SnapshotLog.LogDirName)))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft log tables are created by their first transactional commit " +
        "(SnapshotLog.append / PreparedTable) — the catalog is a read surface")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "schema evolution rides the commit path (SnapshotLog append with " +
        "widened schema), not catalog DDL")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "dropping a log table is a data-lifecycle operation (vacuum + " +
        "directory removal), not catalog DDL")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a log table's identity is its directory; rename at the storage layer")
}

/** One [[SnapshotLog]] snapshot as a DSv2 table (read-only, version
  * pinned at load — -1 = head resolved NOW, so all scans of this handle
  * see one consistent version). */
private[table] final class LogTable(log: SnapshotLog, ident: Identifier,
    version: Long) extends Table with SupportsRead {
  private val snap = log.snapshot(version)

  override def name(): String = ident.toString

  override def schema(): StructType =
    if (snap.schemaJson.nonEmpty)
      DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    else log.read(snap.version).schema // pre-schema manifest: one footer

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(snap.tombstones.isEmpty,
      s"${log.tableDir} has pending merge-on-read tombstones — a raw " +
        "parquet scan would resurrect deleted rows; compact() first or " +
        "read via the tombstone-applying surfaces (PreparedTable.read, " +
        "graft_log(...))")
    new LogScanBuilder(log, snap.version, schema())
  }
}

/** Pushdown-aware scan builder: filters prune FILES from the manifest
  * (and row groups inside Spark's parquet scan); columns prune the read
  * schema. All filters are returned as residuals — exactness is always
  * Spark's, the manifest only removes I/O. */
private[graft] final class LogScanBuilder(log: SnapshotLog, version: Long,
    dataSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = dataSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // everything stays residual: the gate must never drop rows
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val kept = log.filesMatching(LogScanBuilder.boundsOf(pushed), version)
    val dataDir = new Path(log.tableDir, SnapshotLog.DataDirName)
    org.apache.spark.sql.GraftBridge.parquetBatchScan(log.session,
      kept.map(f => new Path(dataDir, f).toString), dataSchema, required,
      pushed)
  }
}

private[graft] object LogScanBuilder {
  /** DSv2 filters → the closed `(column, lo, hi)` ranges the manifest
    * gate prunes on. Only PROVABLY bounded shapes convert — a point
    * predicate, an IN list (its min/max envelope — sound for stats,
    * and the bucket gate keeps everything on a non-point range), or a
    * both-sided range from the conjunction; strict bounds are taken
    * inclusively (conservative: keeps files, never drops rows).
    * Everything else contributes no pruning — absence degrades to a
    * full file list, exactly the contract of the typed read surfaces. */
  private[graft] def boundsOf(filters: Array[Filter]): Seq[(String, Any, Any)] = {
    def leaves(f: Filter): Seq[Filter] = f match {
      case And(l, r) => leaves(l) ++ leaves(r)
      case other     => Seq(other)
    }
    val lo = collection.mutable.Map.empty[String, Any]
    val hi = collection.mutable.Map.empty[String, Any]
    val point = collection.mutable.Map.empty[String, (Any, Any)]
    filters.flatMap(leaves).foreach {
      case EqualTo(c, v) if v != null       => point(c) = (v, v)
      case EqualNullSafe(c, v) if v != null => point(c) = (v, v)
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        // the IN list's numeric envelope (lexical keys skip pruning);
        // exact per-key gating stays on readKeys
        scala.util.Try {
          val sorted = vs.sortWith((a, b) => ColRange.num(a) < ColRange.num(b))
          point(c) = (sorted.head, sorted.last)
        }
      case GreaterThan(c, v) if v != null        => lo(c) = v
      case GreaterThanOrEqual(c, v) if v != null => lo(c) = v
      case LessThan(c, v) if v != null           => hi(c) = v
      case LessThanOrEqual(c, v) if v != null    => hi(c) = v
      case _ => () // unbounded / disjunctive: no pruning contribution
    }
    val ranges = (lo.keySet intersect hi.keySet).toSeq
      .map(c => (c, lo(c), hi(c)))
    (point.toSeq.map { case (c, (l, h)) => (c, l, h) } ++ ranges).distinct
  }
}
