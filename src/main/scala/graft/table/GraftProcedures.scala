package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The maintenance/lifecycle verbs of [[SnapshotLog]] as SQL stored
  * procedures (`CALL cat.system.compact(table => 't1')`) — the DSv2
  * `ProcedureCatalog` surface production table formats expose so an
  * operator can run the whole table lifecycle from a SQL shell or a
  * scheduled SQL job, no Scala required:
  *
  * {{{
  * CALL graft.system.compact(table => 'events')
  * CALL graft.system.vacuum(table => 'events', keep_last => 5)
  * CALL graft.system.restore(table => 'events', version => 3)
  * CALL graft.system.create_tag(table => 'events', name => 'rc1')
  * CALL graft.system.create_branch(table => 'events', name => 'backfill')
  * CALL graft.system.publish_branch(table => 'events', name => 'backfill')
  * CALL graft.system.materialize_deletes(table => 'events')
  * }}}
  *
  * Every procedure routes to the SAME transactional method the typed
  * API calls — one log commit (or a metadata ref op), nothing
  * procedure-specific in the table protocol — and returns a one-row
  * result (new version / count) so SQL callers can assert on the
  * outcome. `isDeterministic` is false: these mutate state and must
  * never be cached or re-planned away. */
private[graft] final class GraftProcedures(rootOf: () => String) {

  private def dirOf(table: String): String = {
    val segs = table.split('.').toSeq
    // not a security boundary in this trust model — but a '..' or empty
    // segment is always a typo, and catching it here keeps the SQL
    // surface inert to it instead of resolving outside the root
    require(segs.nonEmpty && segs.forall(s =>
      s.nonEmpty && s != ".." && !s.contains('/')),
      s"CALL: table identifier '$table' must be dot-separated plain names")
    (rootOf() +: segs).mkString("/")
  }

  private def logOf(input: InternalRow): SnapshotLog = {
    val table = input.getUTF8String(0).toString
    val log = SnapshotLog.inheriting(SparkSession.active, dirOf(table))
    require(log.currentVersion() > 0,
      s"CALL: no committed log table at ${log.tableDir}")
    log
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def result(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  /** One procedure: `body` turns the aligned argument row into the
    * one-row internal result. */
  private final class P(pname: String, params: Array[ProcedureParameter],
      resultSchema: StructType, body: InternalRow => Seq[Any])
      extends UnboundProcedure {
    override def name(): String = pname
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = pname
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val out = body(input)
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] =
            Array(InternalRow.fromSeq(out))
          override def readSchema(): StructType = resultSchema
        }).iterator()
      }
    }
  }

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  /** Comma-separated column list: blanks dropped, empty refused — a
    * `columns => ''` argument should fail HERE with a clear message,
    * not as an unresolved-column error deep in the layout job. */
  private def cols(csv: String, what: String): Seq[String] = {
    val out = csv.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(out.nonEmpty, s"CALL $what: 'columns' needs at least one column name")
    out
  }

  val all: Map[String, UnboundProcedure] = Seq[UnboundProcedure](
    new P("compact",
      Array(in("table", StringType),
        inDefault("target_file_bytes", LongType, (128L << 20).toString)),
      result("version" -> LongType, "files" -> LongType),
      { input =>
        val log = logOf(input)
        log.compact(input.getLong(1))
        val s = log.snapshot()
        Seq(s.version, s.files.size.toLong)
      }),
    new P("compact_small",
      Array(in("table", StringType),
        inDefault("target_file_bytes", LongType, (128L << 20).toString)),
      result("version" -> LongType, "files" -> LongType),
      { input =>
        val log = logOf(input)
        log.compactSmall(input.getLong(1))
        val s = log.snapshot()
        Seq(s.version, s.files.size.toLong)
      }),
    new P("vacuum",
      Array(in("table", StringType),
        inDefault("keep_last", LongType, "2"),
        inDefault("grace_ms", LongType, "3600000")),
      result("deleted_files" -> LongType),
      { input =>
        val log = logOf(input)
        Seq(log.vacuum(input.getLong(1).toInt, input.getLong(2)).toLong)
      }),
    new P("restore",
      Array(in("table", StringType), in("version", LongType)),
      result("version" -> LongType),
      input => Seq(logOf(input).restore(input.getLong(1)).version)),
    new P("create_tag",
      Array(in("table", StringType), in("name", StringType),
        inDefault("version", LongType, "-1")),
      result("version" -> LongType),
      input => Seq(logOf(input).createTag(
        input.getUTF8String(1).toString, input.getLong(2)))),
    new P("drop_tag",
      Array(in("table", StringType), in("name", StringType)),
      result("name" -> StringType),
      { input =>
        val n = input.getUTF8String(1).toString
        logOf(input).dropTag(n)
        Seq(u(n))
      }),
    new P("create_branch",
      Array(in("table", StringType), in("name", StringType),
        inDefault("version", LongType, "-1")),
      result("fork_version" -> LongType),
      input => Seq(logOf(input).createBranch(
        input.getUTF8String(1).toString, input.getLong(2)))),
    new P("publish_branch",
      Array(in("table", StringType), in("name", StringType)),
      result("version" -> LongType),
      input => Seq(logOf(input).publishBranch(
        input.getUTF8String(1).toString))),
    new P("drop_branch",
      Array(in("table", StringType), in("name", StringType)),
      result("name" -> StringType),
      { input =>
        val n = input.getUTF8String(1).toString
        logOf(input).dropBranch(n)
        Seq(u(n))
      }),
    new P("materialize_deletes",
      Array(in("table", StringType)),
      result("version" -> LongType),
      { input =>
        val log = logOf(input)
        log.materializeDeletes()
        Seq(log.currentVersion())
      }),
    new P("materialize_renames",
      Array(in("table", StringType)),
      result("version" -> LongType),
      { input =>
        val log = logOf(input)
        log.materializeRenames()
        Seq(log.currentVersion())
      }),
    new P("add_constraint",
      Array(in("table", StringType), in("name", StringType),
        in("expr", StringType)),
      result("name" -> StringType),
      { input =>
        val n = input.getUTF8String(1).toString
        logOf(input).addConstraint(n, input.getUTF8String(2).toString)
        Seq(u(n))
      }),
    new P("drop_constraint",
      Array(in("table", StringType), in("name", StringType)),
      result("name" -> StringType),
      { input =>
        val n = input.getUTF8String(1).toString
        logOf(input).dropConstraint(n)
        Seq(u(n))
      }),
    new P("enable_change_feed",
      Array(in("table", StringType)),
      result("version" -> LongType),
      { input =>
        val log = logOf(input)
        log.enableChangeFeed()
        Seq(log.currentVersion())
      }),
    new P("set_sort_order",
      Array(in("table", StringType), in("columns", StringType)),
      result("version" -> LongType),
      { input =>
        val log = logOf(input)
        log.setSortOrder(input.getUTF8String(1).toString
          .split(',').toSeq.map(_.trim).filter(_.nonEmpty))
        Seq(log.currentVersion())
      }),
    new P("cluster",
      Array(in("table", StringType), in("columns", StringType),
        inDefault("target_file_bytes", LongType, (128L << 20).toString)),
      result("version" -> LongType),
      { input =>
        val log = logOf(input)
        graft.jobs.LayoutJob.clusterByLog(log,
          cols(input.getUTF8String(1).toString, "cluster"),
          input.getLong(2))
        Seq(log.currentVersion())
      }),
    new P("zorder",
      Array(in("table", StringType), in("columns", StringType),
        inDefault("target_file_bytes", LongType, (128L << 20).toString)),
      result("version" -> LongType),
      { input =>
        val log = logOf(input)
        graft.jobs.LayoutJob.zorderByLog(log,
          cols(input.getUTF8String(1).toString, "zorder"),
          input.getLong(2))
        Seq(log.currentVersion())
      })
  ).map(p => p.name() -> p).toMap
}
