package graft.streaming

import graft.table.SnapshotLog
import org.apache.spark.sql.{GraftBridge, GraftWriteBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** A [[SnapshotLog]] version as a streaming offset — offsets ARE log
  * versions, so recovery is exact: after a crash the engine replays
  * `(checkpointed, current]` and immutable delta files reproduce the
  * batch bit-for-bit. Serializes as the bare number (the same JSON the
  * V1 LongOffset wrote, so existing checkpoints keep resuming). */
private[graft] final case class LogStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** The DSv2 MICRO-BATCH source over a [[SnapshotLog]] table's change
  * feed — the `MicroBatchStream` port of the former V1 `Source`:
  * `latestOffset` reports the table's current version (capped by the
  * admission-control rate limits), and `planInputPartitions(start, end)`
  * plans the files the versions in `(start, end]` added as Spark's own
  * vectorized parquet partitions via [[SnapshotLog.streamBatchGroups]] —
  * no driver-planned DataFrame, no internal-API streaming-frame bridge.
  * The steady-state insert feed (current-epoch files, no CDC columns)
  * passes the columnar batches through UNPROJECTED; rename-epoch files
  * and CDC image rows go through a per-group bound projection (field-id
  * alignment, constant `_change_type`/`_commit_version`, per-row
  * four-type re-typing).
  *
  * Change-commit policy, rate limiting (`maxVersionsPerTrigger` /
  * `maxFilesPerTrigger` behind [[SupportsAdmissionControl]]) and
  * `startingVersion` ('latest' resolved ONCE and persisted under the
  * stream's checkpoint) carry over from the V1 source unchanged —
  * see [[LogChangeFeed]] for the contracts. */
private[graft] final class LogMicroBatchStream(spark: SparkSession,
    tableDir: String,
    pinned: StructType,
    skipChangeCommits: Boolean,
    readChangeFeed: Boolean,
    fourTypeCdc: Boolean,
    maxVersionsPerTrigger: Long,
    maxFilesPerTrigger: Long,
    startingVersion0: String,
    checkpointLocation: String)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  require(maxVersionsPerTrigger >= 0 && maxFilesPerTrigger >= 0,
    "rate limits must be positive (0 = unlimited)")
  require(!fourTypeCdc || readChangeFeed,
    "fourTypeCdc re-types the ROW-LEVEL feed's merge images — it " +
      "requires readChangeFeed=true")
  require(!(skipChangeCommits && readChangeFeed),
    "skipChangeCommits and readChangeFeed are mutually exclusive: the " +
      "row-level feed's contract is completeness — a skipped removal " +
      "would be a silent hole in it")

  // ONE handle for the stream's lifetime: the segment/manifest caches
  // live on the handle, and a per-trigger `def` would re-GET and
  // re-parse every manifest segment of a segmented table per trigger
  private val log = SnapshotLog(spark, tableDir)

  /** Where a FRESH stream starts, as the EXCLUSIVE lower bound of the
    * first batch — same resolution rules as the V1 source: 0 (full
    * history) by default; `startingVersion = N` ships N and later
    * (inclusive — the Delta contract); `'latest'` resolves ONCE and
    * persists under the checkpoint ([[LogChangeFeed.resolveLatestOnce]])
    * so a crash before batch 0's offset write re-reads the SAME bound
    * instead of re-resolving against a moved head. */
  private val startVersion: Long =
    if (startingVersion0.isEmpty) 0L
    else if (startingVersion0.equalsIgnoreCase("latest"))
      LogChangeFeed.resolveLatestOnce(spark, checkpointLocation,
        () => log.currentVersion())
    else {
      val n = startingVersion0.toLong
      val head = log.currentVersion()
      require(n >= 1 && n <= head + 1,
        s"startingVersion $n is outside $tableDir's history " +
          s"(versions 1..$head; ${head + 1} = only future commits)")
      n - 1 // inclusive-of-N contract; offsets are exclusive bounds
    }

  /** Test seam: the resolved exclusive start bound (what a batch-0
    * recovery replays from). */
  private[graft] def resolvedStartVersion: Long = startVersion

  private def versionOf(o: Offset): Long = o match {
    case l: LogStreamOffset => l.version
    case other              => other.json.trim.toLong
  }

  override def initialOffset(): Offset = LogStreamOffset(startVersion)

  override def deserializeOffset(json: String): Offset =
    LogStreamOffset(json.trim.toLong)

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Native `Trigger.AvailableNow`: pin the drain target to the head
    * version AT QUERY START, so the stream stops there even while
    * writers keep committing — and, unlike the engine's generic
    * wrapper (whose `latestOffset` returns the pre-fetched offset,
    * DISCARDING admission control), the rate limits below keep
    * applying per trigger: a capped backfill genuinely drains in
    * bounded, individually-checkpointed batches and stops. */
  @volatile private var availableNowCap: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = log.currentVersion()

  /** ADMISSION CONTROL for backfills: a stream started against a
    * long-lived table would otherwise take the ENTIRE history as one
    * micro-batch (version-ranged offsets). Cap the reported offset so
    * each trigger admits at most maxVersionsPerTrigger versions /
    * maxFilesPerTrigger delta files — always at least ONE version, or a
    * single over-cap commit could never be admitted. One manifest walk
    * per trigger, control-plane sized. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = log.currentVersion()
    val v = if (availableNowCap >= 0) math.min(head, availableNowCap) else head
    val from = math.min(math.max(versionOf(start), startVersion), v)
    if (from >= v) return LogStreamOffset(from)
    if (maxVersionsPerTrigger <= 0 && maxFilesPerTrigger <= 0)
      return LogStreamOffset(v)
    var admitted = 0L
    var files = 0L
    var end = from
    log.changes(from, v).iterator.takeWhile { d =>
      val fits = admitted == 0 ||
        ((maxVersionsPerTrigger <= 0 || admitted < maxVersionsPerTrigger) &&
          (maxFilesPerTrigger <= 0 || files + d.addedFiles.size <= maxFilesPerTrigger))
      if (fits) { admitted += 1; files += d.addedFiles.size; end = d.version }
      fits
    }.foreach(_ => ())
    LogStreamOffset(end)
  }

  /** The factory for the batch planned LAST — the engine builds one
    * scan exec per micro-batch and asks for the factory right after
    * planning its partitions (the V1 `getBatch` handoff, DSv2-shaped). */
  @volatile private var lastFactory: PartitionReaderFactory =
    new GroupProjectingFactory(Array.empty, Array.empty)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val groups = log.streamBatchGroups(versionOf(start), versionOf(end),
      pinned, readChangeFeed, fourTypeCdc, skipChangeCommits)
    val delegates = new Array[PartitionReaderFactory](groups.size)
    val projections = new Array[Option[Seq[Expression]]](groups.size)
    val parts = groups.zipWithIndex.flatMap { case (g, gi) =>
      val batch = GraftBridge.parquetBatchScan(spark, g.paths,
        g.dataSchema, g.dataSchema, Array.empty).toBatch
      delegates(gi) = batch.createReaderFactory()
      projections(gi) = g.outs.map(outs =>
        GraftWriteBridge.boundExprs(spark, g.dataSchema, outs))
      batch.planInputPartitions().map(p =>
        new ProjectedGroupPartition(p, gi): InputPartition)
    }.toArray
    lastFactory = new GroupProjectingFactory(delegates, projections)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory = lastFactory

  override def commit(end: Offset): Unit = () // retention = the vacuum horizon

  override def stop(): Unit = ()

  override def toString: String = s"LogMicroBatchStream[$tableDir]"
}

/** A delegate parquet partition tagged with its projection group. */
private[graft] final class ProjectedGroupPartition(
    val delegate: InputPartition, val group: Int) extends InputPartition {
  override def preferredLocations(): Array[String] =
    delegate.preferredLocations()
}

/** Reader factory dispatching each partition to its group's vectorized
  * parquet factory; identity groups (`projection = None`) pass columnar
  * batches straight through, projected groups read row-based and apply
  * the group's bound projection per row (codegen'd `UnsafeProjection`,
  * built once per partition on the executor). Columnar reads are
  * reported only when EVERY group is identity — Spark requires one mode
  * per scan exec. */
private[graft] final class GroupProjectingFactory(
    delegates: Array[PartitionReaderFactory],
    projections: Array[Option[Seq[Expression]]])
    extends PartitionReaderFactory {
  private val allIdentity = projections.forall(_.isEmpty)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[ProjectedGroupPartition]
    val inner = delegates(gp.group).createReader(gp.delegate)
    projections(gp.group) match {
      case None => inner
      case Some(exprs) => new PartitionReader[InternalRow] {
        private val proj = UnsafeProjection.create(exprs)
        override def next(): Boolean = inner.next()
        override def get(): InternalRow = proj(inner.get())
        override def close(): Unit = inner.close()
      }
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val gp = p.asInstanceOf[ProjectedGroupPartition]
    delegates(gp.group).createColumnarReader(gp.delegate)
  }

  override def supportColumnarReads(p: InputPartition): Boolean = {
    val gp = p.asInstanceOf[ProjectedGroupPartition]
    allIdentity && delegates(gp.group).supportColumnarReads(gp.delegate)
  }
}
