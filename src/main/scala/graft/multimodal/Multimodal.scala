package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operators: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise in `mapPartitions` (the Scala
  * analog of `mapInPandas` — same batch shape: the partition iterator IS the
  * batch, codecs initialized once per partition, never per row).
  *
  * Image decode / resize / feature-extract are REAL (javax.imageio is in the
  * JDK). Audio/video codecs are not in this container, so frame-sampling is a
  * deterministic STUB behind the same plumbing — schema, partitioning, and
  * batch shape are production-shaped; only the codec call is fake (clearly
  * marked below).
  */
object Multimodal {

  final case class ImageFeatures(image_id: String, w: Int, h: Int,
                                 mean_luma: Double, edge_score: Double, phash: Long)
  final case class Thumb(image_id: String, bytes: Array[Byte], w: Int, h: Int)
  final case class Frame(media_id: String, frame_idx: Int, ts_ms: Long, phash: Long)

  // format-sniffing decode for opaque media (per-thread PNG/JPEG attempt via
  // the contended-lock-free path; magic-byte dispatch)
  private def decode(bytes: Array[Byte]): BufferedImage = {
    val fmt = if (bytes.length > 3 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) "jpg" else "png"
    graft.pipeline.Validate.decode(bytes, fmt)
  }

  /** Real decode + feature extraction (mean luma, a cheap gradient edge
    * score, average-hash) — one pass over pixels, scan-side, no shuffle. */
  def imageFeatures(images: DataFrame): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = decode(bytes)
          var luma = 0.0; var edges = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            var prev = 0.0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val l = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
              luma += l
              if (x > 0) edges += math.abs(l - prev)
              prev = l
              x += 1
            }
            y += 1
          }
          val n = img.getWidth * img.getHeight
          ImageFeatures(id, img.getWidth, img.getHeight, luma / n,
            edges / math.max(1, (img.getWidth - 1) * img.getHeight),
            graft.synth.ImageSynth.phashOf(img))
        }
      }
  }

  /** Real resize: Graphics2D bilinear downscale, re-encoded PNG. */
  def resize(images: DataFrame, maxDim: Int): Dataset[Thumb] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = decode(bytes)
          val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
          val w = math.max(1, (img.getWidth * scale).toInt)
          val h = math.max(1, (img.getHeight * scale).toInt)
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          Thumb(id, graft.synth.ImageSynth.encode(out, "png"), w, h)
        }
      }
  }

  /** Video frame sampling — STUB CODEC (no video libs in this container).
    * The Spark plumbing is real: binary column in, one row per sampled frame
    * out (a flatMap/generator shape), deterministic per media_id. A real
    * deployment swaps `fakeDecodeFrame` for an FFmpeg/JavaCV call; nothing
    * else changes. */
  def sampleFrames(media: DataFrame, everyMs: Long, durationMs: Long): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    // STUB: derive a deterministic "frame phash" from (media bytes digest, ts)
    def fakeDecodeFrame(digest: Long, tsMs: Long): Long =
      graft.synth.ImageSynth.mix(digest ^ tsMs)
    media.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        var digest = 1469598103934665603L
        var i = 0
        while (i < bytes.length) { digest = (digest ^ bytes(i)) * 1099511628211L; i += 1 }
        (0L until durationMs by everyMs).zipWithIndex.map { case (ts, idx) =>
          Frame(id, idx, ts, fakeDecodeFrame(digest, ts))
        }
      }
  }
}
