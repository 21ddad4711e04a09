package graft.table

import org.apache.spark.sql.{GraftWriteBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => VSortOrder, Expression => VExpression}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** The NATIVE DSv2 batch write for `INSERT INTO` / `INSERT OVERWRITE`
  * on [[SnapshotLog]] tables — the path that retired the former
  * InsertArrangeRule's analyzed-plan workaround:
  * `RequiresDistributionAndOrdering` reports the
  * table's partition transforms as the required clustering and
  * (transforms ++ declared sort order) as the in-partition ordering, so
  * Spark's OWN write planning inserts the one AQE-visible exchange; each
  * task then writes parquet straight into the log's `data/` directory
  * (files are inert until a manifest names them), rolling to a new file
  * on every partition-tuple change — rows arrive tuple-contiguous by the
  * required ordering, so a tuple lands in at most one file per task, the
  * same ≤1-file-per-tuple layout the staged path produces. Per-task
  * commit messages carry exact (file, tuple, rows); the driver commit
  * lifts footer stats/blooms and runs the SAME append-commit loop as the
  * DataFrame path ([[SnapshotLog.commitNativeAppend]] — spec guard,
  * policy guard, schema merge, CAS), so atomicity and accounting are
  * identical. CHECK constraints are enforced twice, like the staged
  * path: Spark's analyzer-side validation (the table reports them
  * ENFORCED) plus the writers' own violation counters — any violation
  * aborts before a manifest names a file.
  *
  * Every partition transform resolves through the table's function
  * catalog ([[GraftTableCatalog.Functions]] — bucket/days/hours/months/
  * years/truncate, each reproducing the write path's arithmetic
  * exactly; identity needs no function), so the clustered distribution
  * covers every spec the format can declare. The OVERWRITE forms ride
  * the same writers: the builder's `overwrite(filters)` region routes
  * the driver commit to the fused replace ([[SnapshotLog]]'s
  * overwrite-all / replace_where cores) instead of the append core. */
private[graft] object LogAppendWrite {

  /** Which commit the driver runs over the written files. */
  sealed trait Mode
  case object Append extends Mode
  case object OverwriteAll extends Mode
  final case class OverwriteWhere(ranges: Seq[(String, Any, Any)]) extends Mode
  /** `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic` —
    * Spark's OverwritePartitionsDynamic has no V1 fallback, so the
    * native write is what makes the SQL spelling possible at all. */
  case object OverwriteDynamic extends Mode
  /** Atomic CTAS/RTAS staging ([[GraftTableCatalog]] as a
    * StagingTableCatalog): the driver commit hands the validated
    * (file, tuple, rows) list + write schema to the staged table
    * instead of touching any manifest — `commitStagedChanges` owns the
    * ONE atomic publish, so a failed CTAS leaves nothing named. */
  final case class Stash(
      sink: (Seq[(String, Seq[String], Long)], StructType) => Unit)
      extends Mode

  /** Build the write: captures the table's live shape, prepares the
    * parquet writer factory and resolves the tuple/check expressions —
    * all driver-side, before any task runs. */
  def build(log: SnapshotLog, info: LogicalWriteInfo,
      mode: Mode,
      /** Staged CTAS/RTAS write against a DECLARED shape the manifest
        * doesn't hold yet (create) or still holds the OLD table's
        * version of (replace). */
      shapeOverride: Option[(Seq[PartitionField], Seq[String])] = None,
      checksOverride: Option[Map[String, String]] = None): Write = {
    val spark = SparkSession.active
    val writeSchema = info.schema()
    val (spec, sortCols) = shapeOverride.getOrElse(log.liveWriteShape())
    // the exact write-path expressions the staged path computes (string
    // valued; the manifest tuple is their rendering), resolved + bound
    // against the WRITE schema for executor-side row evaluation
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], writeSchema)
    val tupleExprs = GraftWriteBridge.boundExprs(spark, writeSchema,
      spec.map(_.writeExpr(df)))
    // CHECK constraints listed NOW (policyGuard re-compares at commit);
    // a check whose referenced columns are absent from this write's
    // frame passes it (rows read them as NULL — CHECK-NULL passes),
    // detected here by the resolution failure of its expression
    val listed = checksOverride.getOrElse(log.constraints())
    val checks: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] =
      listed.toSeq.sortBy(_._1).flatMap { case (n, sql) =>
        scala.util.Try(GraftWriteBridge.boundExprs(spark, writeSchema,
          Seq(org.apache.spark.sql.functions.expr(sql))).head)
          .toOption.map(n -> _)
      }
    val setup = GraftWriteBridge.parquetWriterSetup(spark, writeSchema)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    new LogAppendWriteImpl(log, writeSchema, spec, sortCols, tupleExprs,
      checks, listed, setup, commitId, mode,
      Option(info.options.get("txnAppId")))
  }
}

private final class LogAppendWriteImpl(log: SnapshotLog,
    writeSchema: StructType, spec: Seq[PartitionField], sortCols: Seq[String],
    tupleExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    checks: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    listedChecks: Map[String, String],
    setup: GraftWriteBridge.TaskWriterSetup, commitId: String,
    mode: LogAppendWrite.Mode, txnAppId: Option[String])
    extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    if (spec.isEmpty) Distributions.unspecified()
    else Distributions.clustered(
      spec.map(pf => pf.v2Transform: VExpression).toArray)

  /** Transforms first (one file per tuple per task), then the declared
    * sort order — the same arrangement [[SnapshotLog.stage]] produces. */
  override def requiredOrdering(): Array[VSortOrder] =
    (spec.map(pf => Expressions.sort(pf.v2Transform,
      SortDirection.ASCENDING)) ++
      sortCols.map(c => Expressions.sort(Expressions.column(c),
        SortDirection.ASCENDING))).toArray

  /** Task files named by the commit messages, after failing loudly on
    * any counted CHECK violation (files deleted first — nothing inert
    * survives an aborted write). Shared by the batch and streaming
    * driver commits. */
  private def validatedFiles(
      messages: Array[WriterCommitMessage]): Seq[LogFileInfo] = {
    val msgs = messages.map(_.asInstanceOf[LogWriteCommit])
    val files = msgs.toSeq.flatMap(_.files)
    val violations = msgs.flatMap(_.violations).groupBy(_._1)
      .map { case (n, vs) => n -> vs.map(_._2).sum }.filter(_._2 > 0)
    if (violations.nonEmpty) {
      deleteFiles(files)
      val (n, bad) = violations.head
      throw new IllegalStateException(
        s"CHECK constraint '$n' (${listedChecks(n)}) on ${log.tableDir}: " +
          s"$bad written row(s) violate it — the commit was aborted, " +
          "nothing published")
    }
    files
  }

  private def deleteFiles(files: Seq[LogFileInfo]): Unit = {
    val dir = log.dataDir
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    files.foreach(f => scala.util.Try(
      fs.delete(new org.apache.hadoop.fs.Path(dir, f.name), false)))
  }

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DataWriterFactory =
      new LogDataWriterFactory(log.dataDir.toString, commitId, setup,
        tupleExprs, checks)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val files = validatedFiles(messages)
      val fileTuples = files.map(f => (f.name, f.tuple, f.rows))
      try mode match {
        case LogAppendWrite.Append =>
          log.commitNativeAppend(fileTuples, writeSchema.json, spec,
            listedChecks)
        case LogAppendWrite.OverwriteAll =>
          log.commitNativeOverwriteAll(fileTuples, writeSchema.json, spec,
            listedChecks)
        case LogAppendWrite.OverwriteWhere(ranges) =>
          log.commitNativeOverwriteWhere(ranges, fileTuples,
            writeSchema, spec, listedChecks)
        case LogAppendWrite.OverwriteDynamic =>
          log.commitNativeOverwritePartitions(fileTuples,
            writeSchema, spec, listedChecks)
        case LogAppendWrite.Stash(sink) =>
          // no manifest touch: the staged table owns the atomic publish
          sink(fileTuples, writeSchema)
      }
      catch { case e: Throwable => deleteFiles(files); throw e }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      deleteFiles(messages.collect {
        case m: LogWriteCommit => m.files
      }.toSeq.flatten)
  }

  /** The STREAMING face of the same write: identical task writers
    * (rolling per partition tuple under the required clustering), and a
    * per-epoch driver commit through the log's EXACTLY-ONCE transaction
    * watermark — appId = `option("txnAppId", ...)` when given, else the
    * streaming query's persistent id (stamped by the engine on the
    * micro-batch thread, checkpoint-stable across restarts), batchId =
    * the epoch. A replayed epoch (crash between sink commit and the
    * engine's own commit-log write) deletes its re-written files and
    * commits nothing. Append mode appends; Complete mode (the builder's
    * truncate()) atomically replaces the table per epoch. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    mode match {
      case LogAppendWrite.Append | LogAppendWrite.OverwriteAll => ()
      case other => throw new UnsupportedOperationException(
        s"streaming writes to ${log.tableDir} support Append and Complete " +
          s"output modes only, got write mode $other")
    }
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      override def createStreamingWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
        new LogDataWriterFactory(log.dataDir.toString, commitId, setup,
          tupleExprs, checks)

      override def commit(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit = {
        val files = validatedFiles(messages)
        val fileTuples = files.map(f => (f.name, f.tuple, f.rows))
        val appId = txnAppId
          .orElse(Option(SparkSession.active.sparkContext
            .getLocalProperty("sql.streaming.queryId")))
          .getOrElse(s"graft-stream:${log.tableDir}")
        try mode match {
          case LogAppendWrite.Append =>
            log.commitNativeAppendTxn(fileTuples, writeSchema.json, spec,
              listedChecks, appId, epochId)
          case LogAppendWrite.OverwriteAll =>
            log.commitNativeOverwriteAllTxn(fileTuples, writeSchema.json,
              spec, listedChecks, appId, epochId)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        catch { case e: Throwable => deleteFiles(files); throw e }
        () // None = replayed epoch; the commit core deleted the files
      }

      override def abort(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit =
        deleteFiles(messages.collect {
          case m: LogWriteCommit => m.files
        }.toSeq.flatten)
    }
  }
}

private final case class LogFileInfo(name: String, tuple: Seq[String],
    rows: Long)

private final case class LogWriteCommit(files: Seq[LogFileInfo],
    violations: Map[String, Long]) extends WriterCommitMessage

private final class LogDataWriterFactory(dataDir: String, commitId: String,
    setup: GraftWriteBridge.TaskWriterSetup,
    tupleExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    checks: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)])
    extends DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new LogDataWriter(dataDir, commitId, setup, tupleExprs, checks,
      partitionId, taskId)

  /** Streaming epochs share the batch writer: file names carry the
    * session-unique taskId, so epochs never collide. */
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)
}

/** One task's writer: rows arrive clustered + ordered by the partition
  * transforms (the Write's requirement), so rolling to a new file on a
  * tuple change yields ≤1 file per tuple per task. CHECK violations are
  * COUNTED, not thrown — the driver aborts with the staged path's exact
  * message, and a raced constraint publish is still caught by
  * policyGuard at commit. */
private final class LogDataWriter(dataDir: String, commitId: String,
    setup: GraftWriteBridge.TaskWriterSetup,
    tupleExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    checks: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, Literal, Predicate, UnsafeProjection}

  // lazily initialized: a zero-row task must produce zero files
  private lazy val proj =
    if (tupleExprs.isEmpty) null else UnsafeProjection.create(tupleExprs)
  // violation iff the check evaluates to exactly FALSE (NULL passes —
  // SQL CHECK semantics, same as the staged observation's <=> false)
  private lazy val checkPreds = checks.map { case (n, e) =>
    n -> Predicate.create(EqualNullSafe(e, Literal(false)))
  }
  private val violations =
    scala.collection.mutable.Map.empty[String, Long]
  private var files = List.empty[LogFileInfo]
  private var current: GraftWriteBridge.TaskFileWriter = _
  private var currentTuple: Seq[String] = null
  private var currentName: String = _
  private var currentRows = 0L
  private var fileIdx = 0

  /** Spark's dynamic-partition null sentinel — the value the staged
    * path's directory decoding records for a NULL transform result. */
  private val NullPart = "__HIVE_DEFAULT_PARTITION__"

  private def tupleOf(row: InternalRow): Seq[String] =
    if (tupleExprs.isEmpty) Nil
    else {
      val r = proj(row)
      tupleExprs.indices.map { i =>
        if (r.isNullAt(i)) NullPart else r.getUTF8String(i).toString
      }
    }

  private def roll(tuple: Seq[String]): Unit = {
    closeCurrent()
    // taskId in the name: a RETRIED (or speculative) attempt of this
    // partition must never collide with its failed twin's files — the
    // twin's abort-time delete could otherwise race the retry's write;
    // the commit coordinator guarantees only one attempt's MESSAGE
    // commits, and only named files reach the manifest
    currentName = s"$commitId-w$partitionId-a$taskId-$fileIdx.parquet"
    fileIdx += 1
    current = setup.open(
      new org.apache.hadoop.fs.Path(dataDir, currentName).toString,
      partitionId, taskId)
    currentTuple = tuple
    currentRows = 0L
  }

  private def closeCurrent(): Unit = if (current != null) {
    current.close()
    files ::= LogFileInfo(currentName, currentTuple, currentRows)
    current = null
  }

  override def write(row: InternalRow): Unit = {
    val tuple = tupleOf(row)
    if (current == null || tuple != currentTuple) roll(tuple)
    current.write(row)
    currentRows += 1
    checkPreds.foreach { case (n, p) =>
      if (p.eval(row)) violations(n) = violations.getOrElse(n, 0L) + 1L
    }
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    LogWriteCommit(files.reverse, violations.toMap)
  }

  override def abort(): Unit = {
    scala.util.Try(if (current != null) current.close())
    val all =
      if (currentName == null) files
      else LogFileInfo(currentName, currentTuple, currentRows) :: files
    val fs = new org.apache.hadoop.fs.Path(dataDir).getFileSystem(
      setup.hadoopConf)
    all.foreach(f => scala.util.Try(
      fs.delete(new org.apache.hadoop.fs.Path(dataDir, f.name), false)))
  }

  override def close(): Unit =
    scala.util.Try(if (current != null) { current.close(); current = null })
}
