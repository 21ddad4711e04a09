package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §7.3-4 north star): media as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The Spark-side plumbing here is real and tested — schema, partition
  * sizing, batch iteration shape — while the actual codec work is STUBBED
  * with a deterministic fake (this container has no image/audio libs; see
  * [[FakeCodec]]). Swapping in a real decoder touches only the inside of
  * [[FakeCodec.decode]].
  *
  * Scale notes: media blobs dominate row size, so the operators (a) never
  * shuffle the binary payload — metadata is extracted first, payload
  * dropped before any wide operation; (b) use `mapPartitions` so a real
  * decoder amortizes model/codec init per partition, the same shape a
  * vectorized/batched UDF gives you; (c) cap partition input bytes via
  * `spark.sql.files.maxPartitionBytes` rather than row counts.
  */
object Multimodal {
  import Relational.t

  /** A media row: id + opaque payload + declared modality. */
  final case class MediaRecord(media_id: Long, modality: String, payload: Array[Byte])

  /** Extracted metadata/features — fixed schema regardless of modality. */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Int,
      checksum: Long)

  /** STUB codec: deterministic fake decode. A real implementation would
    * decode image dimensions / audio duration / sample video frames here;
    * the fake derives them from a stable byte hash so tests are
    * reproducible. Clearly marked per the north-star instructions. */
  object FakeCodec {
    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31L * h + payload(i); i += 1 }
      h
    }
    /** STUB — not a real decoder. */
    def decode(r: MediaRecord): MediaFeatures = {
      val c = checksum(r.payload)
      MediaFeatures(
        media_id = r.media_id,
        modality = r.modality,
        n_bytes = r.payload.length,
        width = (math.abs(c) % 1920).toInt + 1,
        height = (math.abs(c >> 16) % 1080).toInt + 1,
        duration_ms = if (r.modality == "audio") (math.abs(c >> 32) % 300000).toInt else 0,
        checksum = c)
    }
  }

  /** Synthesize a media table from documents (UTF-8 payload stands in for
    * an image/audio blob — the *plumbing* under test, not the codec). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("modality"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Feature extraction over media partitions: the batched decode path.
    * `mapPartitions` (not per-row map) so a real codec initializes once
    * per partition. Returns the typed features frame; payload is dropped
    * before any downstream shuffle. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { it =>
        // real codec would init here, once per partition
        it.map(FakeCodec.decode)
      }
      .toDF()
      .orderBy(col("media_id"))
  }

  /** Aggregate over extracted metadata: bytes per modality. The binary
    * payload never reaches this shuffle. Oracle-checked on the n_bytes
    * side (payload length == n_chars for the ASCII fixture text). */
  def mmBytesByModality(spark: SparkSession, dir: String): DataFrame =
    mmFeatures(spark, dir)
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).cast("bigint").as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(col("modality"))

  def mmBytesByModalityOracle: String =
    """SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
      |  count(*) AS n_media,
      |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
      |  CAST(max(strlen(text)) AS INTEGER) AS max_bytes
      |FROM documents
      |GROUP BY 1 ORDER BY modality""".stripMargin

  /** Target box for [[mmResize]]. */
  private val MaxW = 336
  private val MaxH = 336

  /** Resize planning for image media: aspect-preserving fit into a
    * MaxW×MaxH box (the standard vision-model preprocessing step). The
    * geometry is REAL (pure arithmetic on the decoded dims); only the
    * dims themselves come from the STUB codec. Per-row, no shuffle;
    * payload dropped before output. A real implementation would add the
    * resampled bytes inside the same mapPartitions as [[mmFeatures]]. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    mmFeatures(spark, dir)
      .filter(col("modality") === "image")
      .withColumn("scale",
        least(lit(MaxW) / col("width"), lit(MaxH) / col("height"), lit(1.0)))
      .select(col("media_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale")), lit(1)).cast("int").as("out_width"),
        greatest(floor(col("height") * col("scale")), lit(1)).cast("int").as("out_height"))
      .orderBy(col("media_id"))

  /** Frame-sample planning for time-based media: n evenly spaced sample
    * offsets across the (stub-decoded) duration, as an exploded
    * (media_id, frame_idx, offset_ms) table — the shape a video pipeline
    * feeds to a batched decoder. Codegen'd sequence/explode; one row per
    * sampled frame; payload never carried. */
  def mmFrameSample(spark: SparkSession, dir: String, nFrames: Int = 4): DataFrame =
    mmFeatures(spark, dir)
      .filter(col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        posexplode(sequence(lit(0), lit(nFrames - 1))).as(Seq("frame_idx", "i")))
      .select(col("media_id"), col("frame_idx"),
        floor(col("i") * col("duration_ms") / nFrames +
          col("duration_ms") / (2 * nFrames)).cast("bigint").as("offset_ms"))
      .orderBy(col("media_id"), col("frame_idx"))
}
