package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed media row: opaque bytes + metadata (the `bins` table generalized,
  * /root/reference/weibo.py:2609-2617). */
case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

/** Decoded-media features. width/height/n_frames come from the (stubbed)
  * decoder; sniffed_ext from magic numbers (real). */
case class MediaFeatures(media_id: Long, kind: String, sniffed_ext: String,
    byte_len: Long, width: Int, height: Int, n_frames: Int)

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, decoded/feature-extracted in a batched per-partition
 * stage (the Scala analog of `mapInPandas` — partition iterator → fixed-size
 * batches → vectorized-ish decode → rows).
 *
 * The decode itself is STUBBED (this container ships no image/audio codecs):
 * `fakeDecode` derives deterministic width/height/frame counts from the
 * bytes. The Spark-side contract — schema, binary handling, batch shape,
 * partition-local "decoder" lifecycle — is real and tested; swapping
 * `fakeDecode` for a JNI/codec call changes no plan shape.
 *
 * Magic-number sniffing is real and mirrors the reference's download
 * validation (weibo.py:966-1000): JPEG FFD8FF / PNG sig / GIF / fallback.
 */
object Multimodal {

  val JpegMagic = "FFD8FF"
  val PngMagic = "89504E47"
  val GifMagic = "47494638"

  /** magic-number sniff on a binary column — pure column expression
    * (substring on binary + hex compare; X13). */
  def sniffExt(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(bin, 1, 3)) === JpegMagic, "jpg")
      .when(hex(substring(bin, 1, 4)) === PngMagic, "png")
      .when(hex(substring(bin, 1, 4)) === GifMagic, "gif")
      .otherwise("bin")

  /** JPEG completeness: trailer FFD9 (weibo.py:969-975). Suffix compare on
    * binary via substring from the end. */
  def jpegComplete(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hex(substring(bin, -2, 2)) === "FFD9"

  /** STUB decoder — deterministic fake: dims derived from byte content.
    * Marked clearly; replace with a real codec behind the same signature. */
  def fakeDecode(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val len = bytes.length
    val mixv = graft.crawl.PagesGen.mix(len.toLong * 31 + (if (len > 0) bytes(0) else 0))
    val w = 16 + Math.floorMod(mixv, 1024L).toInt
    val h = 16 + Math.floorMod(mixv >>> 16, 768L).toInt
    val frames = kind match {
      case "video" => 1 + Math.floorMod(mixv >>> 32, 240L).toInt
      case "audio" => 0
      case _       => 1
    }
    (w, h, frames)
  }

  /**
   * Batched per-partition feature extraction. The decoder handle is created
   * once per partition (never per row — U2's lesson, util/llm_analyzer.py
   * call-per-row inverted); rows stream through in `batchSize` groups so a
   * vectorized decoder gets real batches.
   */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // partition-local decoder lifecycle (stub: nothing to open)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val ext =
            if (r.bytes.length >= 3 && (r.bytes(0) & 0xff) == 0xff &&
              (r.bytes(1) & 0xff) == 0xd8 && (r.bytes(2) & 0xff) == 0xff) "jpg"
            else if (r.bytes.length >= 4 && (r.bytes(0) & 0xff) == 0x89 &&
              r.bytes(1) == 'P' && r.bytes(2) == 'N' && r.bytes(3) == 'G') "png"
            else if (r.bytes.length >= 4 && r.bytes.startsWith("GIF8".getBytes)) "gif"
            else "bin"
          val (w, h, f) = fakeDecode(r.kind, r.bytes)
          MediaFeatures(r.media_id, r.kind, ext, r.bytes.length.toLong, w, h, f)
        }
      }
    }
  }

  /**
   * Resize planning — the metadata half of a resize stage (X-brief: resize
   * is decode → scale kernel → encode; the KERNEL is the stubbed decoder's
   * concern, but the dimension arithmetic, never-upscale rule, and plan
   * shape are real and exactly checkable). Fit-within-box preserving aspect
   * ratio, integer arithmetic only (`div`, no float rounding to drift vs an
   * oracle): width-bound when w·maxH ≥ h·maxW, else height-bound; images
   * already inside the box pass through; degenerate scaled-to-zero edges
   * clamp to 1. Pure column expressions — codegen'd, no shuffle.
   */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int,
      wCol: String = "width", hCol: String = "height"): DataFrame = {
    val w = col(wCol).cast("long")
    val h = col(hCol).cast("long")
    val widthBound = w * maxH >= h * maxW
    val outW = when(w <= maxW && h <= maxH, w)
      .when(widthBound, lit(maxW.toLong))
      .otherwise(greatest(lit(1L), expr(s"(`$wCol` * ${maxH}L) div `$hCol`")))
    val outH = when(w <= maxW && h <= maxH, h)
      .when(widthBound, greatest(lit(1L), expr(s"(`$hCol` * ${maxW}L) div `$wCol`")))
      .otherwise(lit(maxH.toLong))
    media.withColumn("out_w", outW.cast("int")).withColumn("out_h", outH.cast("int"))
  }

  /**
   * Frame sampling — evenly-spaced frame indices per video (the shuffle-free
   * explode half of a frame-extract stage; the pixel fetch is the stubbed
   * decoder's concern). `n_frames` comes from a metadata COLUMN — in a real
   * pipeline the container header, here derived deterministically — so the
   * sampling arithmetic is exactly oracle-checkable. Picks
   * min(targetFrames, n_frames) indices: k·n_frames div targetFrames for
   * k < targetFrames when n_frames ≥ targetFrames (distinct because the
   * stride ≥ 1), else every frame. Pure per-row array ops + one explode —
   * no shuffle, frame payload slicing rides the same row.
   */
  def frameSample(media: DataFrame, targetFrames: Int,
      nFramesCol: String = "n_frames", bytesCol: String = "bytes"): DataFrame = {
    require(targetFrames >= 1, s"targetFrames $targetFrames must be >= 1")
    val n = col(nFramesCol).cast("long")
    val m = least(n, lit(targetFrames.toLong))
    // sequence(0, m-1) DESCENDS when m = 0 — zero-frame media must instead
    // drop out of the explode entirely
    val sampled = media
      .withColumn("k",
        explode(when(m >= 1, sequence(lit(0L), m - 1))
          .otherwise(array().cast("array<bigint>"))))
      .withColumn("frame_idx",
        when(n >= targetFrames, expr(s"(k * `$nFramesCol`) div $targetFrames"))
          .otherwise(col("k")).cast("int"))
      .drop("k")
    // stub frame payload: a 4-byte slice at a frame-dependent offset — real
    // plumbing (binary slicing per exploded row), fake pixels
    sampled.withColumn("frame_bytes",
      expr(s"substring(`$bytesCol`, cast(pmod(frame_idx, length(`$bytesCol`)) + 1 as int), 4)"))
  }

  /** Deterministic synthetic media corpus derived from any keyed table —
    * exercises real BinaryType columns end-to-end. */
  def synthMedia(spark: SparkSession, keys: DataFrame, keyCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    keys.select(col(keyCol).cast("long").as("media_id"))
      .withColumn("kind",
        element_at(array(lit("image"), lit("image"), lit("video"), lit("audio")),
          (pmod(col("media_id"), lit(4)) + 1).cast("int")))
      .withColumn("bytes",
        when(pmod(col("media_id"), lit(4)) === 0,
          unhex(concat(lit(JpegMagic), md5(col("media_id").cast("string")), lit("FFD9"))))
        .when(pmod(col("media_id"), lit(4)) === 1,
          unhex(concat(lit(PngMagic), lit("0D0A1A0A"), md5(col("media_id").cast("string")))))
        .when(pmod(col("media_id"), lit(4)) === 2,
          unhex(concat(lit(GifMagic), md5(col("media_id").cast("string")))))
        .otherwise(unhex(md5(col("media_id").cast("string")))))
      .as[MediaRow]
  }
}
