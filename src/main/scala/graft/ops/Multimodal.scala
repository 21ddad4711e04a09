package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §7.3-4 north star): media as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * BOTH modality paths are real end-to-end, on JDK-only codecs: the
  * media fixture synthesizes actual PNG payloads (deterministic
  * dims/pixels derived from doc_id) decoded with `javax.imageio`, and
  * actual RIFF/WAVE payloads (deterministic duration) whose container
  * headers are parsed back with `javax.sound.sampled` — no external
  * deps, and the decoded dimensions/durations are oracle-checked (the
  * planted formulas are SQL-expressible, so DuckDB independently
  * verifies each encode→decode round trip).
  *
  * Scale notes: media blobs dominate row size, so the operators (a) never
  * shuffle the binary payload — metadata is extracted first, payload
  * dropped before any wide operation; (b) use `mapPartitions` so the
  * decoder (and, in a real vision pipeline, the model) initializes once
  * per partition — the same shape a vectorized/batched UDF gives you;
  * (c) cap partition input bytes via `spark.sql.files.maxPartitionBytes`
  * rather than row counts.
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

  /** Planted image dims: pure functions of doc_id, mirrored exactly by
    * the DuckDB oracle — what makes the real decode hash-checkable. */
  private[ops] def imgWidth(id: Long): Int = (16 + id % 32).toInt
  private[ops] def imgHeight(id: Long): Int = (16 + id % 27).toInt

  /** REAL image codec over the JDK's `javax.imageio` (PNG — lossless, so
    * dims and pixels round-trip bit-exact). Stateless and
    * executor-thread-safe; the ImageIO disk cache is disabled because
    * decode runs on executor task threads. */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic PNG: dims + a seed-derived pixel ramp. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, ((seed * 31 + y.toLong * width + x) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** True decoded (width, height) of an encoded image. */
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      (img.getWidth, img.getHeight)
    }
  }

  /** Stable payload checksum (plain byte hash — not a codec). */
  object Checksum {
    def of(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31L * h + payload(i); i += 1 }
      h
    }
  }

  /** REAL audio codec over the JDK's `javax.sound.sampled`: the encoder
    * writes a spec-compliant RIFF/WAVE container (PCM 16-bit mono,
    * 8 kHz), and the decoder parses it back with `AudioSystem` — a
    * genuine container-header round trip with zero external deps (WAV
    * parsing works headless; only lossy codecs need native libs). */
  object AudioCodecWav {
    val SampleRate = 8000

    /** Deterministic PCM WAV: `nSamples` 16-bit mono samples on a
      * seed-derived ramp. Payload size is exactly 44 + 2·nSamples. */
    def encodeWav(nSamples: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1) // PCM
      bb.putShort(1) // mono
      bb.putInt(SampleRate)
      bb.putInt(SampleRate * 2) // byte rate
      bb.putShort(2) // block align
      bb.putShort(16) // bits per sample
      bb.put("data".getBytes); bb.putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        bb.putShort(((seed * 31 + i) & 0x7FFF).toShort)
        i += 1
      }
      bb.array()
    }

    /** True decoded duration in ms, from the parsed container header
      * (frame count / frame rate via `AudioSystem`). */
    def decodeDurationMs(payload: Array[Byte]): Int = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try ((in.getFrameLength * 1000.0 / in.getFormat.getFrameRate).round.toInt)
      finally in.close()
    }
  }

  /** Planted audio duration in ms: a pure function of doc_id, mirrored
    * by the DuckDB oracle — what makes the real WAV decode
    * hash-checkable (8 kHz × 16-bit mono ⇒ 8 samples per ms exactly). */
  private[ops] def audioDurMs(id: Long): Int = (500 + id % 2000).toInt

  /** Synthesize a media table from documents: even doc_ids become REAL
    * PNG images (planted dims, see [[imgWidth]]/[[imgHeight]]); odd
    * doc_ids become REAL PCM WAV blobs (planted duration, see
    * [[audioDurMs]]). Encoding happens per-partition (codec init
    * amortized), and at 100 TB this whole step is a read-side concern —
    * real deployments read binary-column parquet directly. */
  def mediaTable(spark: SparkSession, dir: String,
      only: Option[String] = None): Dataset[MediaRecord] = {
    import spark.implicits._
    // Modality is a pure function of doc_id, so a consumer that reads one
    // modality pushes the filter BELOW the synthesis/decode (mapPartitions
    // is opaque to Catalyst — a .filter(modality = …) placed after it
    // still pays the other modality's encode+decode for every row; §2.3
    // "project before the exchange" applied to per-row compute). The
    // predicate itself pushes into the parquet scan.
    val ids = t(spark, dir, "documents").select(col("doc_id"))
    val wanted = only match {
      case Some("image") => ids.filter(col("doc_id") % 2 === 0)
      case Some("audio") => ids.filter(col("doc_id") % 2 === 1)
      case _ => ids
    }
    // fan the id list to cluster parallelism before the per-row codecs:
    // a single-split documents scan otherwise serializes every encode
    // AND every downstream decode onto one core (§2.5; no-op when the
    // scan is already parallel — see Relational.fanned)
    Relational.fanned(wanted, "doc_id")
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 2 == 0)
            MediaRecord(id, "image", ImageCodec.encodePng(imgWidth(id), imgHeight(id), id))
          else
            MediaRecord(id, "audio",
              AudioCodecWav.encodeWav(audioDurMs(id) * AudioCodecWav.SampleRate / 1000, id))
        }
      }
  }

  /** Feature extraction over media partitions: the batched decode path.
    * `mapPartitions` (not per-row map) so the codec initializes once per
    * partition. Image dims come from a REAL `javax.imageio` decode,
    * audio duration from a REAL `javax.sound.sampled` container parse.
    * Payload is dropped before any downstream shuffle. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    mmFeaturesOf(spark, dir, None).orderBy(col("media_id"))

  /** [[mmFeatures]] restricted to one modality at the SOURCE: single-
    * modality consumers ([[mmResize]], [[mmFrameSample]],
    * [[mmImageStats]]) skip the other modality's encode+decode entirely
    * instead of filtering rows that were already paid for. Output rows
    * are identical to filtering [[mmFeatures]] by modality.
    *
    * The extracted metadata is localCheckpoint'd before the presentation
    * sort: a global `orderBy` is a RANGE exchange, and RangePartitioner
    * bounds come from a SAMPLING pass that executes the child — i.e.
    * the whole encode+decode pipeline — a second time. Materializing the
    * payload-free metadata (a few small columns per media row) makes the
    * decode run once; the sort then reads memory (§1.2 "don't compute
    * things you throw away"). */
  private def mmFeaturesOf(spark: SparkSession, dir: String,
      only: Option[String]): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir, only)
      .mapPartitions { it =>
        it.map { r =>
          val (w, h) =
            if (r.modality == "image") ImageCodec.decodeDims(r.payload) else (0, 0)
          MediaFeatures(
            media_id = r.media_id,
            modality = r.modality,
            n_bytes = r.payload.length,
            width = w,
            height = h,
            duration_ms =
              if (r.modality == "audio") AudioCodecWav.decodeDurationMs(r.payload) else 0,
            checksum = Checksum.of(r.payload))
        }
      }
      .toDF()
      .localCheckpoint() // unsorted; each consumer adds its own presentation sort
  }

  /** Aggregate over extracted metadata: per-modality counts and decoded
    * pixel geometry. The binary payload never reaches this shuffle, and
    * the pixel totals are computed from the REAL ImageIO decode — the
    * oracle recomputes them from the planted dim formulas, so a decode
    * regression hash-mismatches. (Supersedes round-3's
    * mm_bytes_by_modality, whose byte totals stopped being
    * SQL-predictable once image payloads became real PNGs.) */
  def mmMediaSummary(spark: SparkSession, dir: String): DataFrame =
    mmFeaturesOf(spark, dir, None) // unsorted: the aggregate needs no order
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("width").cast("bigint") * col("height")).as("total_pixels"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        sum(col("duration_ms").cast("bigint")).as("total_duration_ms"))
      .orderBy(col("modality"))

  def mmMediaSummaryOracle: String =
    """SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
      |  count(*) AS n_media,
      |  CAST(sum(CASE WHEN doc_id % 2 = 0
      |                THEN (16 + doc_id % 32) * (16 + doc_id % 27) ELSE 0 END) AS BIGINT)
      |    AS total_pixels,
      |  CAST(max(CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 32 ELSE 0 END) AS INTEGER)
      |    AS max_width,
      |  CAST(max(CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 27 ELSE 0 END) AS INTEGER)
      |    AS max_height,
      |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 500 + doc_id % 2000 END) AS BIGINT)
      |    AS total_duration_ms
      |FROM documents
      |GROUP BY 1 ORDER BY modality""".stripMargin

  /** Per-channel pixel statistics from the REAL decode: mean R/G/B over
    * every pixel of every image, computed from `ImageIO.read` +
    * `getRGB`. The planted pixel formula (see [[ImageCodec.encodePng]])
    * is integer arithmetic DuckDB can replay with generate_series, so
    * this oracle checks the decode PIXEL-EXACTLY — a codec that returned
    * right dims but wrong bytes (stride bugs, channel swaps, color-space
    * drift) hash-mismatches here. Decode stays inside mapPartitions;
    * only 4 small columns per image reach the output. */
  def mmImageStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir, Some("image"))
      .filter(col("modality") === "image")
      .mapPartitions { it =>
        it.map { r =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          val (w, h) = (img.getWidth, img.getHeight)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y)
              sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          (r.media_id, sr / n, sg / n, sb / n)
        }
      }
      .toDF("media_id", "r", "g", "b")
      .localCheckpoint() // sort samples would otherwise re-run the pixel scan
      .select(col("media_id"),
        round(col("r"), 4).as("avg_r"),
        round(col("g"), 4).as("avg_g"),
        round(col("b"), 4).as("avg_b"))
      .orderBy(col("media_id"))
  }

  def mmImageStatsOracle: String =
    """SELECT media_id,
      |  round(avg(CAST((v >> 16) & 255 AS DOUBLE)), 4) AS avg_r,
      |  round(avg(CAST((v >> 8) & 255 AS DOUBLE)), 4) AS avg_g,
      |  round(avg(CAST(v & 255 AS DOUBLE)), 4) AS avg_b
      |FROM (
      |  SELECT d.doc_id AS media_id,
      |         (d.doc_id * 31 + y.g * (16 + d.doc_id % 32) + x.g) & 16777215 AS v
      |  FROM documents d
      |  CROSS JOIN generate_series(0, 41) y(g)
      |  CROSS JOIN generate_series(0, 46) x(g)
      |  WHERE d.doc_id % 2 = 0
      |    AND y.g < 16 + d.doc_id % 27
      |    AND x.g < 16 + d.doc_id % 32)
      |GROUP BY media_id
      |ORDER BY media_id""".stripMargin

  /** Target box for [[mmResize]] — below the fixture's max planted dims
    * so both branches (downscale and pass-through) are exercised. */
  private val MaxW = 24
  private val MaxH = 24

  /** Resize planning for image media: aspect-preserving fit into a
    * MaxW×MaxH box (the standard vision-model preprocessing step),
    * computed from the REAL decoded dims. Per-row, no shuffle; payload
    * dropped before output. Oracle-checked: DuckDB reproduces the same
    * geometry from the planted dim formulas, covering the decode AND the
    * arithmetic. A real implementation would emit the resampled bytes
    * inside the same mapPartitions as [[mmFeatures]]. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    mmFeaturesOf(spark, dir, Some("image"))
      .filter(col("modality") === "image")
      .withColumn("scale",
        least(lit(MaxW) / col("width"), lit(MaxH) / col("height"), lit(1.0)))
      .select(col("media_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale")), lit(1)).cast("int").as("out_width"),
        greatest(floor(col("height") * col("scale")), lit(1)).cast("int").as("out_height"))
      .orderBy(col("media_id"))

  def mmResizeOracle: String =
    s"""SELECT media_id, width, height,
      |  CAST(greatest(floor(width * s), 1) AS INTEGER) AS out_width,
      |  CAST(greatest(floor(height * s), 1) AS INTEGER) AS out_height
      |FROM (
      |  SELECT doc_id AS media_id,
      |         CAST(16 + doc_id % 32 AS INTEGER) AS width,
      |         CAST(16 + doc_id % 27 AS INTEGER) AS height,
      |         least($MaxW.0 / (16 + doc_id % 32), $MaxH.0 / (16 + doc_id % 27), 1.0) AS s
      |  FROM documents WHERE doc_id % 2 = 0) x
      |ORDER BY media_id""".stripMargin

  /** Frame-sample planning for time-based media: n evenly spaced sample
    * offsets across the REAL decoded duration, as an exploded
    * (media_id, frame_idx, offset_ms) table — the shape a video pipeline
    * feeds to a batched decoder. Codegen'd sequence/explode; one row per
    * sampled frame; payload never carried. Oracle-checked: DuckDB
    * replays the planted duration formula, so a WAV header-parse
    * regression hash-mismatches here. */
  def mmFrameSample(spark: SparkSession, dir: String, nFrames: Int = 4): DataFrame =
    mmFeaturesOf(spark, dir, Some("audio"))
      .filter(col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        posexplode(sequence(lit(0), lit(nFrames - 1))).as(Seq("frame_idx", "i")))
      .select(col("media_id"), col("frame_idx"),
        floor(col("i") * col("duration_ms") / nFrames +
          col("duration_ms") / (2 * nFrames)).cast("bigint").as("offset_ms"))
      .orderBy(col("media_id"), col("frame_idx"))

  def mmFrameSampleOracle: String =
    """SELECT media_id, frame_idx,
      |  CAST(floor(i * d / 4 + d / 8) AS BIGINT) AS offset_ms
      |FROM (
      |  SELECT doc_id AS media_id, CAST(500 + doc_id % 2000 AS INTEGER) AS d
      |  FROM documents WHERE doc_id % 2 = 1) a
      |CROSS JOIN (SELECT g AS frame_idx, g AS i FROM generate_series(0, 3) t(g)) f
      |ORDER BY media_id, frame_idx""".stripMargin
}
