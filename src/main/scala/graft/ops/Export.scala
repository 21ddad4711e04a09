package graft.ops

import graft.ops.Relational.t
import graft.table.SnapshotLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The END of the LLM data pipeline: curated documents committed as a
  * training-ready shard layout, transactionally. Everything upstream
  * (dedup, gates, sampling, packing, shuffling) exists as individual
  * graded operators; this composes them into the artifact a trainer
  * actually consumes — and commits it through the transaction-log table
  * ([[graft.table.SnapshotLog]]) so the export is atomic (a trainer
  * never sees a half-written shard set), exactly-once under re-runs
  * (the run key rides the `txns` watermark), and versioned (yesterday's
  * export remains readable while today's commits — reproducibility for
  * training-run forensics).
  *
  * Layout semantics, per document surviving curation:
  *  - `shard`  — which of [[ExportShards]] training shards holds it
  *               (modular-hash of doc_id through a large prime: all bits
  *               mix before the small modulus, so stride-allocated ids
  *               spread evenly);
  *  - `pos`    — its position in the shard's within-shard SHUFFLED order
  *               (a second, independent hash stream: training wants
  *               decorrelated reads, and a global shuffle would need a
  *               global sort — deliberately absent);
  *  - `bin_id` — the fixed-token-budget training sequence its first
  *               token lands in under contiguous fill of that shuffled
  *               order ([[ExportBudget]] tokens per sequence).
  *
  * Scale shape: curation is corpus-parallel with one text-keyed dedup
  * shuffle; layout is ONE exchange on the shard key + a per-shard
  * window pass (shards ≫ cores in production keeps sorts
  * partition-local); the commit is one manifest CAS regardless of data
  * size. Nothing here collects to the driver.
  */
object Export {

  /** Training shards in the graded fixture (thousands at 100 TB). */
  private[graft] val ExportShards = 8L

  /** Tokens per packed training sequence. */
  private[graft] val ExportBudget = 512L

  /** Independent primes for the shard / order / split hash streams —
    * distinct from P1–P7 across the sampling family so every stream
    * stays uncorrelated (bit-identical BIGINT math in both engines). */
  private[graft] val P8 = 86028121L
  private[graft] val P9 = 104395301L
  private[graft] val PSplit = 179424673L // == Sampling's split prime P4

  /** The curate → split → layout plan: exact-dedup (min doc_id keeps),
    * token-count quality gate, train-split filter, then the shard/pos/
    * bin assignment. Pure DataFrame plan — the oracle reproduces it in
    * ANSI SQL exactly (all-integer arithmetic end to end). */
  private[graft] def exportPlan(docs: DataFrame): DataFrame = {
    val dedupW = Window.partitionBy(col("text")).orderBy(col("doc_id").asc)
    val curated = docs
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tok") >= 5 && col("n_tok") <= 1000)
      .filter(pmod(col("doc_id") * lit(PSplit), lit(1000L)) < 800) // train split
    val orderW = Window.partitionBy(col("shard"))
      .orderBy(pmod(col("doc_id") * lit(P9), lit(1000000007L)).asc,
        col("doc_id").asc)
    curated
      .select(col("doc_id"), col("n_tok"),
        pmod(pmod(col("doc_id") * lit(P8), lit(1000000007L)),
          lit(ExportShards)).as("shard"))
      .withColumn("pos", row_number().over(orderW))
      .withColumn("off", sum(col("n_tok")).over(orderW) - col("n_tok"))
      .withColumn("bin_id", expr(s"off div $ExportBudget"))
      .select(col("shard"), col("pos"), col("bin_id"), col("doc_id"),
        col("n_tok"))
  }

  /** Once-per-JVM committed export table per data dir (the graded
    * fixture): built ONCE through the log with a run-keyed append, so a
    * second build call — a retried orchestration, a crashed-and-rerun
    * driver — replays as a no-op instead of doubling the corpus. */
  private val exportFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def exportTable(spark: SparkSession, dir: String): String =
    exportFixtures.computeIfAbsent(dir, _ => {
      val table = java.nio.file.Files
        .createTempDirectory("graft-export-").resolve("t").toString
      val log = SnapshotLog(spark, table)
      val runKey = s"export:$dir"
      log.appendRun(exportPlan(t(spark, dir, "documents")), runKey)
      // the exactly-once contract is part of the fixture: a replayed
      // export (same run key) must commit nothing
      require(log.appendRun(
          exportPlan(t(spark, dir, "documents")), runKey).isEmpty,
        "replayed export run must be detected by the txns watermark")
      table
    })

  /** Graded entry: the committed shard layout read back from the log
    * table — every surviving document's (shard, pos, bin_id, doc_id,
    * n_tok) row, so the oracle hash checks the ENTIRE export: curation
    * decisions, split membership, shard spread, shuffled order, and
    * packed-bin assignment, as committed (not as planned). */
  def curExportShards(spark: SparkSession, dir: String): DataFrame = {
    val table = exportTable(spark, dir)
    SnapshotLog(spark, table).read()
      .orderBy(col("shard"), col("pos"))
  }

  def curExportShardsOracle: String =
    s"""WITH deduped AS (
       |  SELECT * FROM (
       |    SELECT doc_id, text, row_number() OVER (PARTITION BY text
       |                                            ORDER BY doc_id ASC) AS rn
       |    FROM documents) x WHERE rn = 1
       |), curated AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM deduped
       |  WHERE len(string_split(text, ' ')) BETWEEN 5 AND 1000
       |    AND (doc_id * $PSplit) % 1000 < 800
       |), laid AS (
       |  SELECT doc_id, n_tok,
       |         ((doc_id * $P8) % 1000000007) % $ExportShards AS shard,
       |         (doc_id * $P9) % 1000000007 AS ord
       |  FROM curated
       |), placed AS (
       |  SELECT shard, doc_id, n_tok,
       |         row_number() OVER (PARTITION BY shard
       |                            ORDER BY ord ASC, doc_id ASC) AS pos,
       |         sum(n_tok) OVER (PARTITION BY shard
       |                          ORDER BY ord ASC, doc_id ASC
       |                          ROWS UNBOUNDED PRECEDING) - n_tok AS off
       |  FROM laid
       |)
       |SELECT shard, CAST(pos AS INTEGER) AS pos,
       |       CAST(off // $ExportBudget AS BIGINT) AS bin_id,
       |       doc_id, n_tok
       |FROM placed
       |ORDER BY shard, pos""".stripMargin
}
