package graft.operators

import graft.util.Hashing
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * The Spark-side architecture — schema, partition-preserving batch
  * processing, feature schema — is real and tested; the actual media
  * decoding is a clearly marked STUB (this container has no image/audio
  * libraries): `stubDecode` derives deterministic fake pixels from the
  * payload bytes. In production the stub body is replaced by the real
  * codec call; nothing around it changes.
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
