package graft.streaming

import graft.table.SnapshotLog
import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, pmod}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[SnapshotLog]] table's change
  * feed — `spark.readStream.format(...).option("path", table).load()`
  * turns every committed append into a micro-batch, the way production
  * table formats expose CDF streaming reads. Downstream incremental
  * consumers (cross-run dedup, a continuously-training ingest job, the
  * [[graft.table.LogMirror]] replication shape) become ordinary
  * streaming queries with checkpointed progress instead of hand-rolled
  * cursor loops.
  *
  * Offsets ARE log versions: `getOffset` reports the table's current
  * version, and `getBatch(start, end)` returns exactly
  * [[SnapshotLog.readChanges]] over `(start, end]` — appended files by
  * name, O(new data) per batch, never O(table). Version-as-offset makes
  * recovery exact: after a crash the engine replays `(checkpointed,
  * current]` and immutable delta files reproduce the batch bit-for-bit.
  * The [[SnapshotLog.vacuum]] version horizon bounds how far behind a
  * checkpoint may fall — the CDF retention contract.
  *
  * Change-commit policy (the insert-only feed contract): row-preserving
  * rewrites (`compact`/`cluster`/`zorder`) ship nothing and are skipped
  * silently; commits that can remove rows the consumer already holds
  * (`delete`/`merge`/`delete_keys`, and `restore` — a rollback past an
  * append un-commits that append's rows) FAIL the stream by default —
  * silently skipping them would let a consumer believe it saw every
  * change. Opting in with `option("skipChangeCommits", "true")` streams
  * past them (the downstream owns reconciliation), mirroring production
  * CDF readers.
  *
  * Rate limiting (`maxVersionsPerTrigger` / `maxFilesPerTrigger`): a
  * stream started against a long-lived table would otherwise take the
  * whole history as ONE micro-batch. The caps bound each trigger's
  * admission (always at least one version), which with
  * `Trigger.AvailableNow` gives the production backfill shape: drain
  * the backlog in bounded batches, checkpoint after each, stop.
  *
  * The schema is pinned at stream start (the engine's contract);
  * widening evolution mid-stream is invisible until restart — each
  * batch projects onto the pinned columns, which widening-only
  * evolution guarantees still exist.
  *
  * Implemented as a V1 `Source` deliberately: `getBatch` can hand back
  * a driver-planned DataFrame (the manifest decides the file list), so
  * the read path reuses the log's pruned parquet scan unchanged instead
  * of reimplementing a DSv2 `PartitionReader`. The V1 API is what
  * Spark's own FileStreamSource runs on.
  */
final class LogChangeFeedSource(spark: SparkSession, tableDir: String,
    skipChangeCommits: Boolean, readChangeFeed: Boolean = false,
    fourTypeCdc: Boolean = false,
    maxVersionsPerTrigger: Long = 0L,
    maxFilesPerTrigger: Long = 0L,
    startingVersion0: String = "",
    metadataPath: String = "") extends Source {
  require(maxVersionsPerTrigger >= 0 && maxFilesPerTrigger >= 0,
    "rate limits must be positive (0 = unlimited)")
  require(!fourTypeCdc || readChangeFeed,
    "fourTypeCdc re-types the ROW-LEVEL feed's merge images — it " +
      "requires readChangeFeed=true")
  require(!(skipChangeCommits && readChangeFeed),
    "skipChangeCommits and readChangeFeed are mutually exclusive: the " +
      "row-level feed's contract is completeness — a skipped removal " +
      "would be a silent hole in it")

  // ONE handle for the source's lifetime: the segment/manifest caches
  // live on the handle, and a per-poll `def` would re-GET and re-parse
  // every manifest segment on each trigger of a segmented table
  private val log = SnapshotLog(spark, tableDir)

  /** Where a FRESH stream (no checkpoint) starts, as the EXCLUSIVE
    * lower bound of the first batch: 0 (full history) by default; an
    * explicit `startingVersion = N` ships version N and later
    * (INCLUSIVE of N — the Delta contract — so the bound is N-1); or
    * `'latest'`, which ships only commits after stream start.
    *
    * `'latest'` is non-deterministic, so its resolution is PERSISTED
    * under the stream's metadata path on first start: a restart that
    * must re-plan an uncommitted batch 0 (the engine re-calls
    * `getBatch(None, plannedEnd)`) re-reads the SAME bound instead of
    * re-resolving against a head that moved while the stream was down —
    * re-resolving would silently drop the planned span (or invert the
    * range and crash the recovery). Checkpointed restarts past batch 0
    * resume from their own offsets; this only seeds the first batch. */
  private val startVersion: Long =
    if (startingVersion0.isEmpty) 0L
    else if (startingVersion0.equalsIgnoreCase("latest"))
      LogChangeFeed.resolveLatestOnce(spark, metadataPath,
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
    * recovery getBatch(None, end) replays from). */
  private[graft] def resolvedStartVersion: Long = startVersion

  /** Commits that can remove rows a consumer already received — a gap
    * in an insert-only feed. `restore` belongs here: rolling back past
    * an append un-commits rows this stream may have shipped; so do
    * `truncate`/`overwrite`, which drop the whole prior table. */
  private val ChangeOps =
    Set("delete", "merge", "delete_keys", "update", "restore", "truncate",
      "overwrite", "replace_where")

  override val schema: StructType =
    LogChangeFeed.streamSchema(spark, tableDir, readChangeFeed)

  /** The end version of the last batch this source PLANNED — what the
    * rate limiter caps relative to. Synced on restart by the engine's
    * recovery `getBatch` call (the V1 contract: the committed range is
    * re-requested before new offsets are asked for), so a checkpointed
    * stream never reports an offset behind its own progress. */
  @volatile private var lastEnd: Long = 0L

  override def getOffset: Option[Offset] = {
    val v = log.currentVersion()
    if (v <= 0) return None
    if (maxVersionsPerTrigger <= 0 && maxFilesPerTrigger <= 0)
      return Some(LongOffset(v))
    // ADMISSION CONTROL for backfills: a stream started against a
    // long-lived table would otherwise take the ENTIRE history as one
    // micro-batch (version-ranged offsets). Cap the reported offset so
    // each trigger admits at most maxVersionsPerTrigger versions /
    // maxFilesPerTrigger delta files — always at least ONE version, or
    // a single over-cap commit could never be admitted. One manifest
    // walk per trigger, control-plane sized. The floor also respects
    // `startingVersion` on a fresh stream.
    val from = math.min(math.max(lastEnd, startVersion), v)
    if (from >= v) return Some(LongOffset(v))
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
    Some(LongOffset(end))
  }

  /** Offsets round-trip through checkpoint JSON as plain numbers;
    * `json.toLong` covers live [[LongOffset]]s and the serialized form
    * the engine hands back after a restart alike. */
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    if (to > lastEnd) lastEnd = to // rate-limiter floor (incl. recovery sync)
    val l = log
    if (readChangeFeed) {
      // row-level CDC batch: inserts AND recorded delete images, with
      // _change_type/_commit_version — fails (stream-visibly) on a
      // restore or an image-less removing commit, the completeness
      // contract
      val delta = l.readChangeRows(from, to, fourType = fourTypeCdc)
        .select(schema.map(f => col(f.name)): _*)
      return GraftBridge.asStreamingFrame(spark, delta)
    }
    // ONE manifest walk serves both the guard and the read
    val deltas = l.changes(from, to)
    if (!skipChangeCommits) {
      val changing = deltas.filter(d => ChangeOps(d.op))
      if (changing.nonEmpty) throw new IllegalStateException(
        s"change feed of $tableDir is insert-only but version " +
          s"${changing.head.version} is a '${changing.head.op}'; resync the " +
          "consumer from a full read, set skipChangeCommits=true to " +
          "stream past row-removing commits, or set readChangeFeed=true " +
          "on a feed-enabled table to receive them as row-level deletes")
    }
    // project onto the pinned stream schema: widening evolution after
    // stream start may have added columns this stream never declared
    val delta = l.readAdded(deltas, to).select(schema.map(f => col(f.name)): _*)
    GraftBridge.asStreamingFrame(spark, delta)
  }

  override def stop(): Unit = ()
}

class LogChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-log-changes"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    // a user-supplied schema would diverge from what getBatch returns
    // (the source always ships the table's committed schema) — reject it
    // loudly instead of letting the plan and the batches disagree
    require(schema.isEmpty,
      "the change feed's schema IS the table's committed schema; " +
        "drop .schema(...) from the readStream")
    (shortName(),
      LogChangeFeed.streamSchema(ctx.sparkSession,
        LogChangeFeed.path(parameters),
        parameters.get("readChangeFeed").exists(_.toBoolean)))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LogChangeFeedSource(ctx.sparkSession, LogChangeFeed.path(parameters),
      parameters.get("skipChangeCommits").exists(_.toBoolean),
      parameters.get("readChangeFeed").exists(_.toBoolean),
      parameters.get("fourTypeCdc").exists(_.toBoolean),
      parameters.get("maxVersionsPerTrigger").map(_.toLong).getOrElse(0L),
      parameters.get("maxFilesPerTrigger").map(_.toLong).getOrElse(0L),
      parameters.getOrElse("startingVersion", ""),
      metadataPath)
}

object LogChangeFeed {

  /** Resolve `startingVersion='latest'` exactly once per checkpoint:
    * the first start writes the head version to
    * `<metadataPath>/graft-starting-version` (create-if-absent — a
    * racing twin reads the winner's value); every later construction,
    * including batch-0 recovery after a crash, reads the SAME bound.
    * A source built without a metadata path (tests driving the class
    * directly) just resolves fresh. */
  private[streaming] def resolveLatestOnce(spark: SparkSession,
      metadataPath: String, head: () => Long): Long = {
    if (metadataPath.isEmpty) return head()
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-starting-version")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) {
      val resolved = head()
      try {
        val out = fs.create(p, false) // no overwrite: first writer wins
        try out.write(resolved.toString.getBytes("UTF-8"))
        finally out.close()
      } catch { case _: java.io.IOException => () } // lost the race: read below
    }
    val in = fs.open(p)
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      .trim.toLong
    finally in.close()
  }

  private[streaming] def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' (the log table dir) is required"))

  /** The table's committed read schema (requires >= 1 version). */
  private[streaming] def tableSchema(spark: SparkSession, tableDir: String): StructType = {
    val log = SnapshotLog(spark, tableDir)
    require(log.currentVersion() > 0,
      s"$tableDir has no committed version to stream from")
    log.read().schema
  }

  /** The stream's pinned schema: the table's committed columns, plus
    * `_change_type`/`_commit_version` in row-level CDC mode. */
  private[streaming] def streamSchema(spark: SparkSession, tableDir: String,
      readChangeFeed: Boolean): StructType = {
    val base = tableSchema(spark, tableDir)
    if (!readChangeFeed) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** `readStream` over `tableDir`'s change feed — the reader-side
    * convenience mirroring [[SnapshotLog.readChanges]] (insert feed)
    * or, with `readChangeFeed = true`, [[SnapshotLog.readChangeRows]]
    * (row-level CDC: micro-batches carry `_change_type` and
    * `_commit_version`, deletes included). */
  def readChangesStream(spark: SparkSession, tableDir: String,
      skipChangeCommits: Boolean = false,
      readChangeFeed: Boolean = false,
      fourTypeCdc: Boolean = false,
      maxVersionsPerTrigger: Long = 0L,
      maxFilesPerTrigger: Long = 0L): DataFrame =
    spark.readStream
      .format(classOf[LogChangeFeedProvider].getName)
      .option("path", tableDir)
      .option("skipChangeCommits", skipChangeCommits.toString)
      .option("readChangeFeed", readChangeFeed.toString)
      .option("fourTypeCdc", fourTypeCdc.toString)
      .option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load()

  /** Once-per-JVM feed fixture for [[evLogChangefeed]]: the events
    * table committed as THREE appends (split on `user_id % 3`) with a
    * compaction between the second and third — so the graded stream
    * crosses a multi-version history including a rewrite that must
    * ship nothing. Memoized like the q29–q31 log fixtures: the table
    * build is one-time; the graded query is the feed read. */
  private val feedFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def eventsFeedTable(spark: SparkSession, dir: String): String =
    feedFixtures.computeIfAbsent(dir, _ => {
      val table = java.nio.file.Files
        .createTempDirectory("graft-feed-events-").resolve("t").toString
      val events = graft.ops.Relational.events(spark, dir)
      val log = SnapshotLog(spark, table)
      (0 until 3).foreach { slice =>
        log.append(events.where(pmod(col("user_id"), lit(3L)) === slice))
        if (slice == 1) log.rewrite("compact")(_.coalesce(1))
      }
      table
    })

  /** Graded entry: per-type event stats computed by STREAMING the log
    * table's change feed — three appended versions arrive as
    * micro-batches (the mid-history compaction ships nothing), so the
    * feed's exactly-once file accounting is what the oracle hash-checks:
    * a missed version, a double-shipped file, or a rewrite leaking into
    * the feed all change the counts. Oracle: the same aggregate over the
    * plain events table (the three slices partition it). */
  def evLogChangefeed(spark: SparkSession, dir: String): DataFrame = {
    val table = eventsFeedTable(spark, dir)
    val name = "ev_log_changefeed_sink"
    spark.catalog.dropTempView(name)
    val q = readChangesStream(spark, table).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  def evLogChangefeedOracle: String =
    """SELECT event_type, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Graded entry: the full LOG-TO-LOG streaming pipeline — the events
    * feed table streams out through the change-feed SOURCE and lands in
    * a second log table through the `graft-log` SINK
    * ([[LogStreamSink]]), each micro-batch one transactional commit
    * under the engine's (queryId, batchId) exactly-once watermark; the
    * aggregate is then computed from the DESTINATION table at rest.
    * What the oracle hash-checks is the whole pipeline's delivery
    * accounting: a dropped batch, a replayed commit, or a sink-side
    * partial write all change the counts. */
  def evLogSinkPipeline(spark: SparkSession, dir: String): DataFrame = {
    val table = eventsFeedTable(spark, dir)
    val dst = feedFixtures.computeIfAbsent(s"sinkdst:$dir", _ => {
      val out = java.nio.file.Files
        .createTempDirectory("graft-feed-sinkdst-").resolve("t").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-feed-sinkckpt-").toString
      val q = readChangesStream(spark, table).writeStream
        .format("graft-log")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      out
    })
    SnapshotLog(spark, dst).read()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  def evLogSinkPipelineOracle: String = evLogChangefeedOracle

  /** Once-per-JVM CDC feed fixture for [[evLogChangefeedCdc]]: a
    * CHANGE-FEED events table — two appends, a copy-on-write delete of
    * every 'error' row so far, then a THIRD append that re-introduces
    * 'error' rows. The graded stream must ship the delete images
    * between the surrounding inserts; netting them out is what the
    * oracle checks. */
  private def eventsCdcTable(spark: SparkSession, dir: String): String =
    feedFixtures.computeIfAbsent(s"cdc:$dir", _ => {
      val table = java.nio.file.Files
        .createTempDirectory("graft-feed-cdc-").resolve("t").toString
      val events = graft.ops.Relational.events(spark, dir)
      val log = SnapshotLog.withChangeFeed(spark, table)
      log.append(events.where(pmod(col("user_id"), lit(3L)) === 0))
      log.append(events.where(pmod(col("user_id"), lit(3L)) === 1))
      log.deleteWhere(("event_type", "error", "error"))
      log.append(events.where(pmod(col("user_id"), lit(3L)) === 2))
      table
    })

  /** Graded entry: the ROW-LEVEL change feed streamed end-to-end
    * (`readChangeFeed = true`) over an append → append → delete →
    * append history, netted per event type: +1/+value per insert image,
    * −1/−value per delete image. The net must equal a plain aggregate
    * of the SURVIVING rows — a missed delete image, a double-shipped
    * file, an image for a row never inserted, or the deleted group's
    * net failing to cancel all hash-mismatch. The 'error' group's net
    * comes out as exactly the third append's rows (deleted history
    * cancelled), pinning insert/delete pairing across an interleaved
    * history, not just totals. Sum rides a decimal so the netting is
    * order-independent. */
  def evLogChangefeedCdc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{sum, when}
    val table = eventsCdcTable(spark, dir)
    val name = "ev_log_changefeed_cdc_sink"
    spark.catalog.dropTempView(name)
    val q = readChangesStream(spark, table, readChangeFeed = true).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val signedValue = when(col("_change_type") === "insert",
      col("value").cast("decimal(28,6)"))
      .otherwise(-col("value").cast("decimal(28,6)"))
    spark.table(name)
      .groupBy(col("event_type"))
      .agg(sum(sign).as("n_events"),
        sum(signedValue).cast("double").as("sum_value"))
      .where(col("n_events") > 0)
      .orderBy(col("event_type"))
  }

  def evLogChangefeedCdcOracle: String =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE NOT (event_type = 'error' AND (user_id % 3) IN (0, 1))
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
