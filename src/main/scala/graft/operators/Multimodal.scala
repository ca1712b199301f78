package graft.operators

import graft.util.Hashing
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * Two decode paths:
  *   - IMAGE (PNG) is REAL: [[pngAssets]] writes genuine PNG payloads
  *     (stdlib `javax.imageio`, deterministic gray gradient) and
  *     [[decodeImages]] decodes them back with `ImageIO.read` inside
  *     `mapPartitions` — a full encode→decode roundtrip, oracle-checked
  *     (the expected dims + gray sum are recomputed in SQL from the
  *     dumped seeds).
  *   - AUDIO (WAV) is REAL too: [[wavAssets]] / [[decodeAudio]] do the
  *     same roundtrip through stdlib `javax.sound.sampled`.
  *   - VIDEO remains a clearly marked STUB (no video codec in the JDK
  *     or this container): `stubDecode` derives deterministic fake dims
  *     from the payload bytes. In production the stub body is replaced
  *     by the real codec call; nothing around it changes. (`assets` +
  *     `extractFeatures` keep all three mimes on the stub path — they
  *     exercise the generic binary-column plumbing.)
  */
object Multimodal {

  final case class AssetRow(
      asset_id: Long,
      mime: String,
      n_bytes: Long,
      payload: Array[Byte])

  final case class FeatureRow(
      asset_id: Long,
      mime: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Build a binary-asset table from the documents table: payload =
    * UTF-8 bytes of the text (the stand-in for real media bytes), mime
    * assigned deterministically. */
  def assets(docs: DataFrame): Dataset[AssetRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val mime = (Hashing.hashLong(id, 5L) % 3).abs match {
          case 0 => "image/png"
          case 1 => "audio/wav"
          case _ => "video/mp4"
        }
        AssetRow(id, mime, bytes.length.toLong, bytes)
      }
  }

  /** The stub decode's seed hash. Public so Verify can dump it per
    * asset — the DuckDB oracle recomputes width/height/n_frames from
    * the dumped hash with its own unsigned-shift/mod arithmetic. */
  def decodeHash(payloadLen: Long, mime: String): Long =
    Hashing.mix64(payloadLen ^ Hashing.hashString(mime))

  /** STUB DECODE — deterministic fake media decode.
    * Replace with the real codec (e.g. javax.imageio / ffmpeg bindings)
    * in production; signature and batch shape stay identical. */
  private def stubDecode(payload: Array[Byte], mime: String): (Int, Int, Int) = {
    val h = decodeHash(payload.length.toLong, mime)
    val width = 64 + ((h >>> 8) % 192).toInt
    val height = 64 + ((h >>> 16) % 192).toInt
    val frames = if (mime.startsWith("video")) 1 + ((h >>> 24) % 120).toInt else 1
    (width, height, frames)
  }

  /** Decode + feature-extract: batch-shaped `mapPartitions` (the Scala
    * analogue of a vectorized/Pandas UDF — amortizes any per-batch codec
    * setup across the partition). The 8-dim feature is a byte-histogram
    * projection of the payload — deterministic, stub-grade. */
  def extractFeatures(as: Dataset[AssetRow]): Dataset[FeatureRow] = {
    val spark = as.sparkSession
    import spark.implicits._
    as.mapPartitions { it =>
      // per-partition "codec" setup would happen here, once
      it.map { a =>
        val (w, h, frames) = stubDecode(a.payload, a.mime)
        val hist = new Array[Float](8)
        var i = 0
        while (i < a.payload.length) {
          hist((a.payload(i) & 0xff) >> 5) += 1f
          i += 1
        }
        val norm = math.max(1f, a.payload.length.toFloat)
        var j = 0
        while (j < 8) { hist(j) /= norm; j += 1 }
        FeatureRow(a.asset_id, a.mime, w, h, frames, hist)
      }
    }
  }

  // --- real PNG decode path (stdlib javax.imageio, JDK-bundled) ---------

  final case class DecodedImageRow(
      asset_id: Long,
      width: Int,
      height: Int,
      sum_gray: Long)

  /** Per-asset PNG seed — one definition shared by the encoder, the
    * Verify aux dump, and (via the dump) the DuckDB oracle. */
  def pngSeed(id: Long): Long = Hashing.mix64(Hashing.hashLong(id, 97L))

  /** Deterministic grayscale PNG: dims from the same shift/mod
    * arithmetic as the stub (SQL-recomputable), pixels a row gradient
    * gray(y) = (g0 + y) % 256 — enough structure that a decode bug in
    * row order, dimensions, or sample depth changes the gray sum. */
  def encodePng(seed: Long): Array[Byte] = {
    val width = 64 + ((seed >>> 8) % 192).toInt
    val height = 64 + ((seed >>> 16) % 192).toInt
    val g0 = ((seed >>> 32) % 256).toInt
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      val g = (g0 + y) % 256
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real binary image column: one genuine PNG per document id. */
  def pngAssets(docs: DataFrame): Dataset[AssetRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.map { id =>
        val bytes = encodePng(pngSeed(id))
        AssetRow(id, "image/png", bytes.length.toLong, bytes)
      }
    }
  }

  /** REAL image decode: `ImageIO.read` over the binary column, batch-
    * shaped `mapPartitions` so per-partition codec setup happens once.
    * Emits decoded dimensions plus the full-raster gray sum — the
    * roundtrip evidence the oracle checks against the seed arithmetic. */
  def decodeImages(as: Dataset[AssetRow]): Dataset[DecodedImageRow] = {
    val spark = as.sparkSession
    import spark.implicits._
    as.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"undecodable image payload for asset ${a.asset_id}")
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        DecodedImageRow(a.asset_id, w, h, sum)
      }
    }
  }

  // --- real WAV decode path (stdlib javax.sound.sampled, JDK-bundled) --

  final case class DecodedAudioRow(
      asset_id: Long,
      n_samples: Long,
      sample_rate: Int,
      sum_amp: Long)

  /** Per-asset WAV seed — shared by encoder, aux dump, and oracle,
    * like [[pngSeed]]. Different salt so image and audio payloads of
    * one doc are unrelated. */
  def wavSeed(id: Long): Long = Hashing.mix64(Hashing.hashLong(id, 131L))

  private val WavRate = 8000

  /** Deterministic mono 8-bit unsigned PCM WAV: sample count and a
    * stride-7 amplitude ramp from the seed — SQL-recomputable, and
    * structured enough that a decode bug in frame count, sample order,
    * or sample width changes the amplitude sum. */
  def encodeWav(seed: Long): Array[Byte] = {
    val n = 256 + ((seed >>> 8) % 1024).toInt
    val s0 = ((seed >>> 16) % 256).toInt
    val samples = new Array[Byte](n)
    var t = 0
    while (t < n) { samples(t) = ((s0 + 7 * t) % 256).toByte; t += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(WavRate.toFloat, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real binary audio column: one genuine WAV per document id. */
  def wavAssets(docs: DataFrame): Dataset[AssetRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes = encodeWav(wavSeed(id))
        AssetRow(id, "audio/wav", bytes.length.toLong, bytes)
      }
    }
  }

  /** REAL audio decode: `AudioSystem.getAudioInputStream` over the
    * binary column inside `mapPartitions`. Emits the decoded frame
    * count, sample rate, and unsigned-amplitude sum — the roundtrip
    * evidence the oracle checks against the seed arithmetic. */
  def decodeAudio(as: Dataset[AssetRow]): Dataset[DecodedAudioRow] = {
    val spark = as.sparkSession
    import spark.implicits._
    as.mapPartitions { it =>
      it.map { a =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          s"unexpected decoded format for asset ${a.asset_id}: $fmt")
        val buf = ais.readAllBytes()
        var sum = 0L
        var t = 0
        while (t < buf.length) { sum += (buf(t) & 0xff); t += 1 }
        DecodedAudioRow(a.asset_id, buf.length.toLong,
          math.round(fmt.getSampleRate), sum)
      }
    }
  }

  /** Frame sampling for video assets: every `stride`-th frame index up
    * to n_frames — pure relational explode, no decode needed until the
    * downstream stage touches the sampled frame. */
  def sampleFrames(features: Dataset[FeatureRow], stride: Int): DataFrame = {
    features.toDF()
      .where(col("mime").startsWith("video"))
      .select(col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }
}
