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
  *   - VIDEO is split the way production pipelines split it: the
  *     CONTAINER DEMUX is real ([[mp4Assets]] writes genuine minimal
  *     ISO-BMFF files, [[demuxVideo]] walks the box tree back and reads
  *     stsz/mdhd), while the CODEC decode of the frame payloads remains
  *     a clearly marked STUB (no video codec in the JDK or this
  *     container) — `stubDecode` stands in for it. (`assets` +
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
        // row-at-a-time getSamples: identical sample values, one bounds
        // check per ROW instead of per pixel (the per-pixel getSample
        // path dominated the decode stage's task time)
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, 0, rowBuf)
          var x = 0
          while (x < w) { sum += rowBuf(x); x += 1 }
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

  // --- real MP4 (ISO BMFF) container demux path ------------------------
  //
  // Production video pipelines split DEMUX (walking the container's box
  // structure — pure bytes, public ISO/IEC 14496-12) from DECODE (the
  // codec). The demux half is implemented for real here: encodeMp4
  // writes a genuine minimal ISO-BMFF file (ftyp / moov / mvhd / trak /
  // mdia / mdhd / minf / stbl / stsz / stts + mdat) and demuxVideo
  // walks the box tree back with a real recursive parser, recovering
  // frame count, frame-byte total, timescale, and duration. Only the
  // codec payload inside mdat remains fake (no video codec in the JDK).

  final case class DemuxedVideoRow(
      asset_id: Long,
      n_frames: Int,
      sum_frame_bytes: Long,
      timescale: Int,
      duration: Long)

  def mp4Seed(id: Long): Long = Hashing.mix64(Hashing.hashLong(id, 173L))

  private val Mp4Timescale = 1000
  private val Mp4FrameDur = 100L // timescale units per frame

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length)
    out.put(typ.getBytes("US-ASCII"))
    out.put(payload)
    out.array()
  }

  /** Deterministic single-trak MP4 with every mandatory stbl box
    * (stsd/stsz/stsc/stco/stts) plus tkhd/hdlr/mdhd/mvhd and a correct
    * absolute chunk offset in stco (two-pass build): `n` fake frames
    * with a stride-13 size ramp — SQL-recomputable, and structured so a
    * demux bug in box walking, size tables, offsets, or endianness
    * changes the recovered values. The stsd sample entry carries a
    * private fourcc (no real codec exists here), and vmhd/dinf are
    * omitted; "real" means the box STRUCTURE and its parser, not
    * interoperability with external tools (none are in this container
    * to validate against). */
  def encodeMp4(seed: Long): Array[Byte] = {
    val n = 8 + ((seed >>> 8) % 56).toInt
    val sizes = Array.tabulate(n)(i => 64 + (((seed >>> 16) + 13L * i) % 192).toInt)
    val frames = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n) { // fake codec payload: deterministic filler bytes
      val b = ((seed >>> 24) + i).toByte
      frames.write(Array.fill(sizes(i))(b), 0, sizes(i))
      i += 1
    }
    val duration = n * Mp4FrameDur

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0) ++
      "isom".getBytes("US-ASCII"))

    def buildMoov(chunkOffset: Int): Array[Byte] = {
      val stsz = {
        val b = java.nio.ByteBuffer.allocate(12 + 4 * n)
        b.putInt(0).putInt(0).putInt(n) // version/flags, sample_size=0 (per-sample), count
        sizes.foreach(b.putInt)
        box("stsz", b.array())
      }
      val stts = {
        val b = java.nio.ByteBuffer.allocate(16)
        b.putInt(0).putInt(1).putInt(n).putInt(Mp4FrameDur.toInt) // one run: n × frameDur
        box("stts", b.array())
      }
      val stsc = { // one run: all samples in chunk 1
        val b = java.nio.ByteBuffer.allocate(20)
        b.putInt(0).putInt(1).putInt(1).putInt(n).putInt(1)
        box("stsc", b.array())
      }
      val stco = { // single chunk at the mdat payload offset
        val b = java.nio.ByteBuffer.allocate(12)
        b.putInt(0).putInt(1).putInt(chunkOffset)
        box("stco", b.array())
      }
      val stsd = { // entry_count 1; minimal sample entry, private fourcc
        val b = java.nio.ByteBuffer.allocate(8 + 16)
        b.putInt(0).putInt(1)
        b.putInt(16).put("gfk1".getBytes("US-ASCII"))
        b.put(Array.fill[Byte](6)(0)).putShort(1) // reserved, data_ref_idx
        box("stsd", b.array())
      }
      val mdhd = {
        val b = java.nio.ByteBuffer.allocate(24)
        b.putInt(0).putInt(0).putInt(0) // version/flags, ctime, mtime
        b.putInt(Mp4Timescale).putInt(duration.toInt)
        b.putShort(0x55c4.toShort).putShort(0) // language "und", pre_defined
        box("mdhd", b.array())
      }
      val hdlr = {
        val b = java.nio.ByteBuffer.allocate(25)
        b.putInt(0).putInt(0).put("vide".getBytes("US-ASCII"))
        b.put(Array.fill[Byte](12)(0)).put(0.toByte) // reserved, empty name
        box("hdlr", b.array())
      }
      val tkhd = {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(7).putInt(0).putInt(0).putInt(1) // flags on, times, track 1
        b.putInt(0).putInt(duration.toInt)        // reserved, duration
        box("tkhd", b.array())
      }
      val mvhd = {
        val b = java.nio.ByteBuffer.allocate(100)
        b.putInt(0).putInt(0).putInt(0).putInt(Mp4Timescale).putInt(duration.toInt)
        box("mvhd", b.array())
      }
      val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stts)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val trak = box("trak", tkhd ++ mdia)
      box("moov", mvhd ++ trak)
    }
    // two passes: moov's size is offset-independent, so build once to
    // learn the mdat payload offset, then rebuild with it in stco
    val moovLen = buildMoov(0).length
    val moov = buildMoov(ftyp.length + moovLen + 8)
    val mdat = box("mdat", frames.toByteArray)
    ftyp ++ moov ++ mdat
  }

  /** Real binary video column: one genuine (codec-stubbed) MP4 per doc. */
  def mp4Assets(docs: DataFrame): Dataset[AssetRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes = encodeMp4(mp4Seed(id))
        AssetRow(id, "video/mp4", bytes.length.toLong, bytes)
      }
    }
  }

  /** REAL ISO-BMFF demux: recursively walks the box tree (container
    * boxes moov/trak/mdia/minf/stbl) and reads stsz (frame count +
    * per-frame sizes) and mdhd (timescale + duration) — exactly what a
    * production demux stage extracts before any codec runs. */
  def demuxVideo(as: Dataset[AssetRow]): Dataset[DemuxedVideoRow] = {
    val spark = as.sparkSession
    import spark.implicits._
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    as.mapPartitions { it =>
      it.map { a =>
        var nFrames = 0
        var sumBytes = 0L
        var timescale = 0
        var duration = 0L
        def walk(buf: java.nio.ByteBuffer): Unit =
          while (buf.remaining() >= 8) {
            val size = buf.getInt
            val typBytes = new Array[Byte](4)
            buf.get(typBytes)
            val typ = new String(typBytes, "US-ASCII")
            require(size >= 8 && size - 8 <= buf.remaining(),
              s"malformed box $typ (size $size) in asset ${a.asset_id}")
            val payload = buf.slice()
            payload.limit(size - 8)
            typ match {
              case t if containers(t) => walk(payload)
              case "stsz" =>
                // loud on multi-trak: silently keeping the LAST trak's
                // table would return another stream's frame counts
                require(nFrames == 0,
                  s"multiple traks in asset ${a.asset_id}; this demux reads single-trak files")
                payload.getInt // version/flags
                val fixed = payload.getInt
                val n = payload.getInt
                nFrames = n
                sumBytes =
                  if (fixed != 0) fixed.toLong * n
                  else (0 until n).map(_ => payload.getInt.toLong).sum
              case "mdhd" =>
                require(timescale == 0,
                  s"multiple traks in asset ${a.asset_id}; this demux reads single-trak files")
                val vf = payload.getInt
                if ((vf >>> 24) == 1) { // version 1: 64-bit times/duration
                  payload.getLong; payload.getLong
                  timescale = payload.getInt
                  duration = payload.getLong
                } else {
                  payload.getInt; payload.getInt // ctime, mtime
                  timescale = payload.getInt
                  duration = payload.getInt.toLong
                }
              case _ => // ftyp, mvhd, tkhd, hdlr, stsd, stsc, stco, stts, mdat
            }
            buf.position(buf.position() + (size - 8))
          }
        walk(java.nio.ByteBuffer.wrap(a.payload))
        require(nFrames > 0 && timescale > 0,
          s"no stsz/mdhd found in asset ${a.asset_id}")
        DemuxedVideoRow(a.asset_id, nFrames, sumBytes, timescale, duration)
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
