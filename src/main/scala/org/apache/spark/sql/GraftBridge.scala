package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4.x `Column` wraps a `ColumnNode` rather than an `Expression`;
  * the classic-API converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * Declaring this one-object shim inside `package org.apache.spark.sql`
  * makes that access legal while keeping all graft code in its own
  * packages. Used only by [[graft.functions.GraftFunctions]] to surface
  * custom codegen expressions through the public Column API.
  */
object GraftBridge {
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column → Expression conversion through the session's
    * ColumnNode converter. `ExpressionUtils.expression` wraps lazily
    * (`ColumnNodeExpression`), which custom logical nodes must not leak
    * into the analyzer — this yields the real expression tree
    * (UnresolvedAttribute / SortOrder / ...) immediately. */
  def toExprEager(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`); runs the analyzer, so custom logical nodes built
    * over unresolved column expressions resolve normally. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** The session's stable unique id (`sessionUUID` is `private[sql]`) —
    * a cache key that, unlike `System.identityHashCode`, can neither
    * collide nor be reused by a fresh session after a GC. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** Clone a session — shared SparkContext, COPIED session state
    * (runtime conf, temp views, registered functions). `cloneSession`
    * is `private[sql]`; exposed so a job can execute an existing plan
    * under an isolated conf (pair with [[logicalPlan]] + [[ofRows]])
    * without mutating the caller's session. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** The storage-partitioned-join execution shape: one keyed input
    * partition per bucket group, each delegating its actual reading to
    * Spark's own vectorized `ParquetPartitionReaderFactory`. Spark's
    * key-grouped planning (`DataSourceV2ScanExecBase.groupPartitions`)
    * needs every `InputPartition` to implement `HasPartitionKey`, but
    * the parquet reader factory pattern-matches on `FilePartition` —
    * which is a case class and cannot be extended — so the partitions
    * here WRAP a `FilePartition` and the factory unwraps before
    * delegating. Planning cost is the same O(files) the plain path
    * pays (the per-group scans share Hadoop conf and schema). */
  def keyedParquetBatch(spark: SparkSession,
      dataSchema: types.StructType, readSchema: types.StructType,
      filters: Array[sources.Filter],
      groups: Seq[(catalyst.InternalRow, Seq[String])]): connector.read.Batch = {
    val globalFactory = parquetBatchScan(spark, groups.flatMap(_._2),
      dataSchema, readSchema, filters).toBatch.createReaderFactory()
    val parts: Array[connector.read.InputPartition] =
      groups.flatMap { case (key, files) =>
        parquetBatchScan(spark, files, dataSchema, readSchema, filters)
          .toBatch.planInputPartitions().map {
            case fp: execution.datasources.FilePartition =>
              new KeyedFilePartition(fp, key)
            case other => throw new IllegalStateException(
              s"ParquetScan planned a non-FilePartition: $other")
          }
      }.toArray
    new connector.read.Batch {
      override def planInputPartitions(): Array[connector.read.InputPartition] = parts
      override def createReaderFactory(): connector.read.PartitionReaderFactory =
        new UnwrappingReaderFactory(globalFactory)
    }
  }

  /** A connector-layer literal carrying an EXPLICIT data type (the
    * `LiteralValue` case class is `private[sql]`; the public
    * `Expressions.literal` infers the type and rejects null) — test
    * surface for `graft.table.LogBatchScan`'s runtime-predicate parse. */
  def v2Literal(value: Any, dt: types.DataType): connector.expressions.Literal[_] =
    connector.expressions.LiteralValue(value, dt)

  /** Spark's own vectorized parquet DSv2 scan over an EXPLICIT file
    * list — the execution half of `graft.table.GraftTableCatalog`: the
    * connector prunes files from the manifest, then delegates the read
    * to the SAME `ParquetScan` Spark plans for any parquet table
    * (vectorized reader, whole-stage codegen, row-group/page skipping
    * from `filters`). `ParquetScan`/`InMemoryFileIndex`/`sessionState`
    * are `private[sql]`, hence this bridge hop. */
  /** Deep-nullable view of a schema (`asNullable` is `private[spark]`).
    * The manifest records whatever nullability the FIRST writer's
    * encoder happened to carry (Scala primitives encode non-null), but
    * the files can genuinely hold NULLs later — an UPDATE may SET a
    * column NULL — and a vectorized parquet read under a falsely
    * non-nullable schema returns the slot's raw bits (0.0) instead of
    * NULL. Every schema handed to a scan must pass through here. */
  def asNullable(st: types.StructType): types.StructType =
    st.asNullable

  /** The session's Hadoop conf in a serializable shell for
    * executor-side filesystem access from library code
    * (`SerializableConfiguration` is `private[spark]`). */
  final class ShippableConf private[GraftBridge] (
      c: org.apache.spark.util.SerializableConfiguration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = c.value
  }

  def shippableConf(spark: SparkSession): ShippableConf =
    new ShippableConf(new org.apache.spark.util.SerializableConfiguration(
      spark.asInstanceOf[classic.SparkSession].sessionState.newHadoopConf()))

  def parquetBatchScan(spark: SparkSession, files: Seq[String],
      dataSchema: types.StructType, readSchema: types.StructType,
      filters: Array[sources.Filter]): connector.read.Scan = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    // nullable-forced: see [[asNullable]] — a falsely non-nullable
    // schema makes the vectorized reader emit 0/0.0 for real NULLs
    val ds = asNullable(dataSchema)
    val rs = asNullable(readSchema)
    val index = new execution.datasources.InMemoryFileIndex(
      cs, files.map(f => new org.apache.hadoop.fs.Path(f)),
      Map.empty, Some(ds),
      execution.datasources.NoopCache, None, None)
    execution.datasources.v2.parquet.ParquetScan(cs,
      cs.sessionState.newHadoopConf(), index, ds, rs,
      new types.StructType(), filters,
      new util.CaseInsensitiveStringMap(java.util.Collections.emptyMap()),
      None, Nil, Nil, Array.empty)
  }

  /** Apply a [[SparkSessionExtensions]]' collected function injections to
    * a registry — the same `private[sql]` hook the session-state builder
    * drives at session construction; exposed for testing installers. */
  def applyExtensionFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** Materialize an extensions object's collected planner strategies —
    * the `private[sql]` hook the session builder drives; exposed so the
    * `spark.sql.extensions` installer path is testable without a fresh
    * SparkContext (static conf). */
  def buildPlannerStrategies(
      ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  /** Build a NEW session over the same SparkContext with the given
    * extensions installed — what `spark.sql.extensions` (a STATIC conf,
    * applicable only before the first session exists) does at
    * first-session construction, made available to a live context.
    *
    * Goes through the public `Builder.withExtensions` hook; the builder
    * only constructs a session (rather than returning the current one)
    * when no active/default session exists, so those slots are cleared
    * and restored around the call — the parent session stays this JVM's
    * default. The parent's modifiable session confs (shuffle partitions,
    * timezone, parquet flags) are copied onto the new session; static
    * confs are skipped (they live on the shared SparkContext anyway). */
  def sessionWithExtensions(
      spark: SparkSession, f: SparkSessionExtensions => Unit): SparkSession = {
    // the clear/build/restore window mutates the JVM-global session
    // slots; serialize it so a concurrent builder()/getActiveSession on
    // another thread of a shared driver can't observe the cleared state
    val built = sessionSlotLock.synchronized {
      val prevDefault = classic.SparkSession.getDefaultSession
      val prevActive = classic.SparkSession.getActiveSession
      classic.SparkSession.clearDefaultSession()
      classic.SparkSession.clearActiveSession()
      try classic.SparkSession.builder().withExtensions(f).getOrCreate()
      finally {
        prevDefault.foreach(classic.SparkSession.setDefaultSession)
        prevActive.foreach(classic.SparkSession.setActiveSession)
      }
    }
    spark.conf.getAll.foreach { case (k, v) =>
      try built.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf
    }
    built
  }

  private val sessionSlotLock = new Object

  /** Materialize an extensions object's collected optimizer-rule
    * injections (same testing rationale as [[buildPlannerStrategies]]). */
  def buildOptimizerRules(
      ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}

/** A parquet [[org.apache.spark.sql.execution.datasources.FilePartition]]
  * carrying its bucket-group key — the unit Spark's key-grouped
  * (storage-partitioned) execution clusters and aligns across join
  * sides. Ships to executors: both halves are Serializable. */
private[sql] final class KeyedFilePartition(
    val delegate: execution.datasources.FilePartition,
    key: catalyst.InternalRow)
    extends connector.read.HasPartitionKey {
  override def partitionKey(): catalyst.InternalRow = key
  override def preferredLocations(): Array[String] =
    delegate.preferredLocations()
}

/** Unwraps [[KeyedFilePartition]]s before delegating to the vectorized
  * parquet reader factory (which pattern-matches on `FilePartition`). */
private[sql] final class UnwrappingReaderFactory(
    delegate: connector.read.PartitionReaderFactory)
    extends connector.read.PartitionReaderFactory {
  private def unwrap(p: connector.read.InputPartition): connector.read.InputPartition =
    p match {
      case k: KeyedFilePartition => k.delegate
      case other                 => other
    }
  override def createReader(p: connector.read.InputPartition)
      : connector.read.PartitionReader[catalyst.InternalRow] =
    delegate.createReader(unwrap(p))
  override def createColumnarReader(p: connector.read.InputPartition)
      : connector.read.PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    delegate.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: connector.read.InputPartition): Boolean =
    delegate.supportColumnarReads(unwrap(p))
}

/** Bridges for the NATIVE DSv2 batch write (graft.table.LogAppendWrite):
  * per-task parquet writing through Spark's own `ParquetFileFormat`
  * writer factory (the exact row→parquet path `df.write.parquet` uses,
  * minus the job-commit protocol the log's manifest replaces), and
  * driver-side resolution of DataFrame-API expressions to BOUND
  * catalyst expressions executors can evaluate per `InternalRow`. All
  * the `private[sql]`/`private[spark]` touches live here. */
object GraftWriteBridge {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, Expression}
  import org.apache.spark.sql.types.StructType

  /** Serializable task-writer setup: the parquet `OutputWriterFactory`
    * prepared at the driver (schema + compression + TIMESTAMP_MICROS
    * pinned into the job conf — INT96 carries no usable footer stats)
    * plus that conf, shippable to executors. */
  final class TaskWriterSetup private[GraftWriteBridge] (
      factory: execution.datasources.OutputWriterFactory,
      conf: org.apache.spark.util.SerializableConfiguration,
      schema: StructType) extends Serializable {
    /** Open a parquet writer at `path` (created on open; the log's
      * files are inert until a manifest names them). */
    def open(path: String, partitionId: Int, attempt: Long): TaskFileWriter = {
      val jobId = new org.apache.hadoop.mapreduce.JobID("graft-write", 0)
      val tid = new org.apache.hadoop.mapreduce.TaskAttemptID(
        new org.apache.hadoop.mapreduce.TaskID(jobId,
          org.apache.hadoop.mapreduce.TaskType.MAP, partitionId),
        (attempt % Int.MaxValue).toInt)
      val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        conf.value, tid)
      new TaskFileWriter(factory.newInstance(path, schema, ctx))
    }

    /** The prepared job conf — executor-side filesystem access for
      * abort-time cleanup. */
    def hadoopConf: org.apache.hadoop.conf.Configuration = conf.value
  }

  final class TaskFileWriter private[GraftWriteBridge] (
      w: execution.datasources.OutputWriter) {
    def write(row: InternalRow): Unit = w.write(row)
    def close(): Unit = w.close()
  }

  /** Driver half: prepare the parquet writer factory for `schema`. */
  def parquetWriterSetup(spark: SparkSession,
      schema: StructType): TaskWriterSetup = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      cs.sessionState.newHadoopConf())
    val factory = new execution.datasources.parquet.ParquetFileFormat()
      .prepareWrite(cs, job, Map("compression" -> "snappy"), schema)
    // time columns as TIMESTAMP_MICROS, same as the staged write path:
    // footer-prunable min/max (INT96, the deprecated default, has none)
    job.getConfiguration.set(
      org.apache.spark.sql.internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      "TIMESTAMP_MICROS")
    new TaskWriterSetup(factory,
      new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
      schema)
  }

  /** Resolve `cols` against `schema` and return them BOUND to the
    * schema's attribute order — per-row evaluation on executors of the
    * exact expressions the DataFrame API would compute (the write
    * path's partition transforms and CHECK predicates). */
  def boundExprs(spark: SparkSession, schema: StructType,
      cols: Seq[Column]): Seq[Expression] = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val dummy = cs.createDataFrame(
      cs.sparkContext.emptyRDD[Row], schema)
    val analyzed = dummy.select(cols: _*).queryExecution.analyzed
    val project = analyzed.asInstanceOf[catalyst.plans.logical.Project]
    val childOut = project.child.output
    project.projectList.map { e =>
      val bare = e match { case a: Alias => a.child; case other => other }
      BindReferences.bindReference(expandReplaceable(bare),
        catalyst.expressions.AttributeSeq(childOut))
    }
  }

  /** Expand analysis-time sugar so the bound expression is EVALUABLE.
    * The plans here are analyzed but never optimized ([[boundExprs]]
    * evaluates per row on executors, outside any query), so
    * `RuntimeReplaceable` nodes — `to_date`/`date_trunc` inside the
    * partition-transform write expressions, BETWEEN / `nvl` in CHECK
    * SQL — still carry their unevaluable sugar form: the optimizer's
    * ReplaceExpressions rule is what normally swaps in `replacement`,
    * and `UnsafeProjection.create`/`Predicate.create` assert on the
    * sugar node. Replacements can nest further sugar and share inputs
    * through `With` common-subexpression blocks, so expand to fixpoint
    * and inline `CommonExpressionRef`s (same decomposition as
    * `graft.table.LogDml.generalCond`). */
  private def expandReplaceable(expr: Expression): Expression = {
    import catalyst.expressions.{CommonExpressionRef, RuntimeReplaceable, With}
    var cur = expr
    var rounds = 0
    while (rounds < 32 && cur.exists(e =>
        e.isInstanceOf[RuntimeReplaceable] || e.isInstanceOf[With])) {
      rounds += 1
      cur = cur.transformUp {
        case r: RuntimeReplaceable => r.replacement
        case w: With =>
          val byId = w.defs.map(d => d.id -> d.child).toMap
          w.child.transformUp {
            case ref: CommonExpressionRef => byId.getOrElse(ref.id, ref)
          }
      }
    }
    cur
  }
}
