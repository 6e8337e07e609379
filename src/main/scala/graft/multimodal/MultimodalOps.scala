package graft.multimodal

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (BASELINE.json north_star): image/audio/
  * video as opaque `binary` columns with typed metadata, processed with
  * per-partition batch operators.
  *
  * Decode is REAL for all three modalities via JDK-only codecs:
  * images through `javax.imageio` (PNG/BMP/GIF/JPEG → row-major RGB),
  * WAV audio through `javax.sound.sampled` (RIFF/WAVE → raw PCM), and
  * MJPEG-in-AVI video through a RIFF chunk walk + the same JDK JPEG
  * decoder (every `##dc`/`##db` frame in the `movi` list → RGB).
  * Payloads outside those containers fall back to the identity
  * stand-in so the feature pipeline stays total and deterministic.
  * Decode attempts are GATED on the row's declared `kind` (image
  * decode only for kind=image, etc.) — a cross-modal byte coincidence
  * can then never change a feature vector.
  *
  * Scale notes: media bytes never shuffle — features are extracted
  * map-side and only the (id, Array[Float]) projection flows downstream.
  * Partition sizing for ~MB-scale blobs is files.maxPartitionBytes-
  * driven, not row-count-driven.
  */
object MultimodalOps {

  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      embedding: Array[Float])

  /** A decoder as the real pipeline would hold one: expensive to
    * construct (codec init, model load), reused across a partition.
    *
    * Catches around codec parses are `NonFatal`: a malformed payload
    * (or a byte coincidence that passes the magic sniff) falls back to
    * identity, but fatal JVM errors (OutOfMemoryError, LinkageError)
    * propagate instead of silently changing feature vectors. */
  final class MediaDecoder {
    // never spill ImageInputStreams to temp files — decode is in the
    // per-row hot path and the payloads are already in memory
    javax.imageio.ImageIO.setUseCache(false)

    /** Container sniff BEFORE handing bytes to ImageIO: attempting a
      * full ImageIO.read on every non-image payload costs a reader
      * probe per row (measured 152 s on the 100× replica's 2M docs).
      * PNG / GIF / BMP / JPEG magic bytes — the formats the JDK
      * decodes. */
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte))

    /** RIFF/WAVE container sniff (same per-row discipline as images). */
    private def looksLikeWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** RIFF/AVI container sniff. */
    private def looksLikeAvi(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    /** Decode media bytes according to the row's declared modality:
      * real pixels for ImageIO-readable images, real PCM samples for
      * WAV audio, concatenated per-frame RGB for MJPEG-in-AVI video,
      * identity fallback for everything else. Gating on `kind` keeps
      * cross-modal magic-byte coincidences from ever being decoded. */
    def decode(kind: String, bytes: Array[Byte]): Array[Byte] = kind match {
      case "image" => decodeImage(bytes)
      case "audio" => if (looksLikeWav(bytes)) decodeWav(bytes) else bytes
      case "video" => if (looksLikeAvi(bytes)) decodeAvi(bytes) else bytes
      case _ => bytes
    }

    private def decodeImage(bytes: Array[Byte]): Array[Byte] = {
      val img =
        if (!looksLikeImage(bytes)) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case NonFatal(_) => null }
      if (img == null) bytes else rgbOf(img)
    }

    /** Row-major RGB triplets of a decoded image. */
    private def rgbOf(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var p = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(p) = ((rgb >> 16) & 0xff).toByte
          out(p + 1) = ((rgb >> 8) & 0xff).toByte
          out(p + 2) = (rgb & 0xff).toByte
          p += 3
          x += 1
        }
        y += 1
      }
      out
    }

    /** WAV → raw PCM sample bytes through the JDK's sampled-audio
      * stack; malformed RIFF (or a payload that happens to start with
      * the magic) falls back to identity via the catch. */
    private def decodeWav(bytes: Array[Byte]): Array[Byte] =
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = ais.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = ais.read(buf) }
          val pcm = out.toByteArray
          if (pcm.isEmpty) bytes else pcm
        } finally ais.close()
      } catch { case NonFatal(_) => bytes }

    /** MJPEG-in-AVI → concatenated per-frame RGB triplets: walk the
      * RIFF chunk tree to the `movi` LIST, decode every video-stream
      * frame chunk (`##dc`/`##db`) that carries a JPEG payload through
      * the JDK JPEG decoder. Zero-frame or malformed containers fall
      * back to identity. */
    private def decodeAvi(bytes: Array[Byte]): Array[Byte] =
      try {
        val frames = aviFramePayloads(bytes)
        val out = new java.io.ByteArrayOutputStream()
        var any = false
        frames.foreach { payload =>
          val img =
            if (!looksLikeImage(payload)) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
              catch { case NonFatal(_) => null }
          if (img != null) { out.write(rgbOf(img)); any = true }
        }
        if (any) out.toByteArray else bytes
      } catch { case NonFatal(_) => bytes }

    /** The raw frame payloads of an AVI container, in stream order:
      * every `##dc` (compressed) / `##db` (uncompressed DIB) chunk
      * inside the `movi` LIST, including inside nested `rec ` LISTs.
      * Standard RIFF rules: little-endian chunk sizes, chunks padded
      * to even offsets. */
    private[multimodal] def aviFramePayloads(b: Array[Byte]): Vector[Array[Byte]] = {
      def le32(off: Int): Long =
        (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      def fourcc(off: Int): String =
        new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val frames = Vector.newBuilder[Array[Byte]]
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))
      // walk chunks in [off, end); recurse into movi / rec LISTs
      def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
        var off = off0
        while (off + 8 <= end) {
          val id = fourcc(off)
          val size = le32(off + 4)
          val dataStart = off + 8
          val dataEnd = math.min(end.toLong, dataStart + size).toInt
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(dataStart)
            if (listType == "movi" || (inMovi && listType == "rec "))
              walk(dataStart + 4, dataEnd, inMovi = true)
          } else if (inMovi && isFrameId(id) && size > 0 && dataEnd > dataStart) {
            frames += java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
          }
          // advance in LONG arithmetic: size is an unsigned 32-bit field,
          // so a crafted 0xFFFFFFF8 would wrap `size.toInt` to a zero (or
          // negative) step and the walk would re-read the same chunk
          // forever — an executor-task hang no NonFatal catch can stop.
          // In Long the offset strictly increases by ≥ 8 per chunk, so
          // termination is structural; an overrunning size just clamps
          // to `end` (same truncated-tail behavior as dataEnd above).
          val next = dataStart.toLong + size + (size & 1L) // even-pad
          off = if (next > end) end else next.toInt
        }
      }
      walk(12, b.length, inMovi = false) // skip RIFF size + 'AVI '
      frames.result()
    }

    /** 16-dim feature vector: mean of byte values per 16-way stripe —
      * deterministic, content-sensitive, shape-identical to a model
      * embedding. */
    def features(decoded: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](16)
      val counts = new Array[Long](16)
      var i = 0
      while (i < decoded.length) {
        val b = i % 16
        sums(b) += decoded(i) & 0xff
        counts(b) += 1
        i += 1
      }
      (0 until 16).map(b => if (counts(b) == 0) 0f else (sums(b).toDouble / counts(b)).toFloat).toArray
    }
  }

  /** Deterministic fake media generator (xorshift bytes from media_id). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      var x = id * 2654435761L + 1
      val bytes = new Array[Byte](256 + (id % 64).toInt)
      var i = 0
      while (i < bytes.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        bytes(i) = (x & 0xff).toByte
        i += 1
      }
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      MediaRow(id, kind, bytes, 64, 64, 16000, 1000L + id)
    }
  }

  /** decode + feature-extract with the per-partition batch shape: ONE
    * decoder per partition, streamed over rows (never materializing the
    * partition). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = new MediaDecoder // once per partition
      rows.map { r =>
        val decoded = decoder.decode(r.kind, r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, decoder.features(decoded))
      }
    }
  }

  /** "Resize" stub for images: crops/pads the byte payload to the target
    * size — the plumbing (binary in, binary out, metadata update) is what
    * a real resample kernel plugs into. */
  def resize(spark: SparkSession, media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = java.util.Arrays.copyOf(r.bytes, targetBytes)
        r.copy(bytes = out, width = targetBytes / 4, height = 4)
      }
    }
  }

  /** Frame sampling for video: REAL for MJPEG-in-AVI payloads — every
    * k-th `movi` frame decodes through the JDK JPEG decoder and emits
    * (media_id, frame_no, frame_bytes = that frame's RGB triplets).
    * Non-AVI video payloads keep the chunk stand-in (every k-th
    * 64-byte slice) so the explode shape stays total. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      val decoder = new MediaDecoder
      rows.flatMap { r =>
        val isAvi = r.bytes.length >= 12 &&
          r.bytes(0) == 'R' && r.bytes(1) == 'I' && r.bytes(2) == 'F' &&
          r.bytes(3) == 'F' && r.bytes(8) == 'A' && r.bytes(9) == 'V' &&
          r.bytes(10) == 'I' && r.bytes(11) == ' '
        val payloads =
          if (isAvi)
            // each frame through the single-image decode path (RGB for
            // JPEG payloads, the raw chunk for anything else)
            try decoder.aviFramePayloads(r.bytes).map(decoder.decode("image", _))
            catch { case NonFatal(_) => r.bytes.grouped(64).toVector }
          else r.bytes.grouped(64).toVector
        payloads.zipWithIndex
          .filter { case (_, i) => i % everyK == 0 }
          .map { case (chunk, i) => (r.media_id, i, chunk) }
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Feature table as a DataFrame shaped for SimilarityQueries
    * (vec_id, embedding) — multimodal features feed the same ANN path. */
  def featureTable(spark: SparkSession, media: Dataset[MediaRow]): DataFrame =
    extractFeatures(spark, media)
      .toDF()
      .select(col("media_id").as("vec_id"), col("embedding"))
}
