package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §7.3-4 north star): media as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The IMAGE path is real end-to-end: the media fixture synthesizes
  * actual PNG payloads (deterministic dims/pixels derived from doc_id)
  * and [[mmFeatures]] decodes them with the JDK's `javax.imageio` inside
  * `mapPartitions` — no external deps, and the decoded dimensions are
  * oracle-checked (the planted dim formulas are SQL-expressible, so
  * DuckDB independently verifies the encode→decode round trip). The
  * AUDIO path keeps the clearly-marked [[FakeCodec]] duration stub (no
  * audio codec ships with the JDK).
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

  /** STUB codec for the audio path only (the JDK ships no audio codec;
    * clearly marked per the north-star instructions): duration derived
    * from a stable byte hash so tests are reproducible. A real
    * implementation would parse the container header here. */
  object FakeCodec {
    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31L * h + payload(i); i += 1 }
      h
    }
    /** STUB — not a real decoder (audio only). */
    def durationMs(payload: Array[Byte]): Int =
      (math.abs(checksum(payload) >> 32) % 300000).toInt
  }

  /** Synthesize a media table from documents: even doc_ids become REAL
    * PNG images (planted dims, see [[imgWidth]]/[[imgHeight]]); odd
    * doc_ids carry their UTF-8 text as a stand-in audio blob. Encoding
    * happens per-partition (codec init amortized), and at 100 TB this
    * whole step is a read-side concern — real deployments read
    * binary-column parquet directly. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          if (id % 2 == 0)
            MediaRecord(id, "image", ImageCodec.encodePng(imgWidth(id), imgHeight(id), id))
          else
            MediaRecord(id, "audio", text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
  }

  /** Feature extraction over media partitions: the batched decode path.
    * `mapPartitions` (not per-row map) so the codec initializes once per
    * partition. Image dims come from a REAL `javax.imageio` decode;
    * audio duration from the declared stub. Payload is dropped before
    * any downstream shuffle. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
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
            duration_ms = if (r.modality == "audio") FakeCodec.durationMs(r.payload) else 0,
            checksum = FakeCodec.checksum(r.payload))
        }
      }
      .toDF()
      .orderBy(col("media_id"))
  }

  /** Aggregate over extracted metadata: per-modality counts and decoded
    * pixel geometry. The binary payload never reaches this shuffle, and
    * the pixel totals are computed from the REAL ImageIO decode — the
    * oracle recomputes them from the planted dim formulas, so a decode
    * regression hash-mismatches. (Supersedes round-3's
    * mm_bytes_by_modality, whose byte totals stopped being
    * SQL-predictable once image payloads became real PNGs.) */
  def mmMediaSummary(spark: SparkSession, dir: String): DataFrame =
    mmFeatures(spark, dir)
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("width").cast("bigint") * col("height")).as("total_pixels"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))
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
      |    AS max_height
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
    mediaTable(spark, dir)
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
    mmFeatures(spark, dir)
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
    * offsets across the (stub-decoded) duration, as an exploded
    * (media_id, frame_idx, offset_ms) table — the shape a video pipeline
    * feeds to a batched decoder. Codegen'd sequence/explode; one row per
    * sampled frame; payload never carried. Rows-only graded (duration
    * comes from the audio stub). */
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
