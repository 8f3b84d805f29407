package graft.pipeline

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.ImageSynth

/** Per-row validation of surviving rows against the synthesized source of
  * truth (BASELINE.json input_hint): decoded-pixel allclose — exact for png,
  * PSNR ≥ 40 dB for jpg — plus exact caption equality.
  *
  * Scan-side only: decode + re-render + compare all happen inside the
  * partition that read the bytes; nothing but the tiny verdict rows shuffle.
  */
object Validate {

  // thread-local cached readers: ImageIO.read's registry sniffing serializes
  // threads on the IIORegistry lock (see ImageSynth.encode note)
  private val jpegReader = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    ImageIO.getImageReadersByFormatName("jpeg").next())
  private val pngReader = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    ImageIO.getImageReadersByFormatName("png").next())

  private val inStream = ThreadLocal.withInitial[graft.synth.ByteArrayImageInputStream](() =>
    new graft.synth.ByteArrayImageInputStream())

  def decode(bytes: Array[Byte], fmt: String): java.awt.image.BufferedImage = {
    val reader = if (fmt == "jpg") jpegReader.get() else pngReader.get()
    // reused per-thread Disposer/finalizer-free stream (graft.synth.ByteStreams)
    val iis = inStream.get().setBytes(bytes)
    reader.setInput(iis, true, true)
    reader.read(0)
  }

  final case class Verdict(image_id: String, fmt: String, psnr: Double,
                           pixels_ok: Boolean, caption_ok: Boolean, phash_ok: Boolean)

  val JpgPsnrFloor = 40.0

  // per-thread reused packed-pixel buffers: per-pixel getRGB pays a
  // ColorModel conversion call per pixel and dominated the PSNR profile
  private val pixBufA = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](64 * 64))
  private val pixBufB = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](64 * 64))

  /** Packed ARGB pixels of `img`: the backing array directly for
    * TYPE_INT_RGB (zero copy), one batch getRGB into the reused buffer
    * otherwise (decoded JPEGs are TYPE_3BYTE_BGR). */
  private def packedPixels(img: java.awt.image.BufferedImage, buf: ThreadLocal[Array[Int]]): Array[Int] = {
    // the zero-copy path needs the backing array to be exactly w*h contiguous
    // ints from offset 0 — NOT true for subimages or strided rasters, which
    // must take the batch-conversion path or PSNR reads the wrong pixels
    val sm = img.getSampleModel
    val direct = img.getType == java.awt.image.BufferedImage.TYPE_INT_RGB &&
      img.getRaster.getDataBuffer.getOffset == 0 &&
      img.getRaster.getSampleModelTranslateX == 0 &&
      img.getRaster.getSampleModelTranslateY == 0 &&
      (sm match {
        case c: java.awt.image.SinglePixelPackedSampleModel => c.getScanlineStride == img.getWidth
        case _ => false
      })
    if (direct)
      img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData
    else {
      val n = img.getWidth * img.getHeight
      var b = buf.get()
      if (b.length < n) { b = new Array[Int](n); buf.set(b) }
      img.getRGB(0, 0, img.getWidth, img.getHeight, b, 0, img.getWidth)
      b
    }
  }

  /** PSNR in dB between two same-size images; +Infinity if identical. */
  def psnr(a: java.awt.image.BufferedImage, b: java.awt.image.BufferedImage): Double = {
    if (a.getWidth != b.getWidth || a.getHeight != b.getHeight) return 0.0
    val pa = packedPixels(a, pixBufA)
    val pb = packedPixels(b, pixBufB)
    val n = a.getWidth * a.getHeight
    var se = 0.0
    var i = 0
    while (i < n) {
      val p = pa(i); val q = pb(i)
      val dr = ((p >> 16) & 0xFF) - ((q >> 16) & 0xFF)
      val dg = ((p >> 8) & 0xFF) - ((q >> 8) & 0xFF)
      val db = (p & 0xFF) - (q & 0xFF)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (3.0 * n)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** One row's full validation verdict (decode + re-render + PSNR compare +
    * caption/phash equality) — the per-row kernel shared by [[verdicts]] and
    * Checkpoint.runEpoch's single grouped manifest pass. Runs entirely inside
    * the partition that holds the bytes. */
  def verdictOf(id: String, bytes: Array[Byte], fmt: String,
                caption: String, phash: Long): Verdict = {
    val i = id.stripPrefix("img").toLong
    val seed = ImageSynth.seedOf(i)
    val decoded = decode(bytes, fmt)
    val reference = ImageSynth.render(seed, decoded.getWidth, decoded.getHeight)
    val p = psnr(decoded, reference)
    val pixelsOk = if (fmt == "png") p.isPosInfinity else p >= JpgPsnrFloor
    val (uid, team, day, _, _) = ImageSynth.metaOf(seed)
    val expectCaption = ImageSynth.captionOf(seed, uid, team, day)
    Verdict(id, fmt, if (p.isPosInfinity) 99.0 else p,
      pixelsOk, caption == expectCaption, phash == ImageSynth.phashOf(reference))
  }

  /** Validate a stored image table (must carry image_id, bytes, w, h, fmt,
    * caption, phash). Returns one Verdict per row. */
  def verdicts(rows: DataFrame): Dataset[Verdict] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("image_id"), col("bytes"), col("fmt"), col("caption"), col("phash"))
      .as[(String, Array[Byte], String, String, Long)]
      .mapPartitions(_.map { case (id, bytes, fmt, caption, phash) =>
        verdictOf(id, bytes, fmt, caption, phash)
      })
  }

  /** Aggregate validation summary (the gate-facing shape). The per-format
    * verdict counts are what makes the oracle analytic: DuckDB re-derives the
    * png/jpg split from the seed arithmetic (mix(seed^5) bit 0), so the
    * engine's observed decode outcomes per format are cross-checked against
    * an independent derivation instead of pinned constants. */
  def summary(rows: DataFrame): DataFrame =
    verdicts(rows).toDF().agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("pixels_ok"), 1L).otherwise(0L)).as("n_pixels_ok"),
      sum(when(col("caption_ok"), 1L).otherwise(0L)).as("n_captions_ok"),
      sum(when(col("phash_ok"), 1L).otherwise(0L)).as("n_phash_ok"),
      sum(when(col("fmt") === "png" && col("pixels_ok"), 1L).otherwise(0L)).as("n_png_ok"),
      sum(when(col("fmt") === "jpg" && col("pixels_ok"), 1L).otherwise(0L)).as("n_jpg_ok"),
      min(when(col("fmt") === "jpg", col("psnr"))).as("min_jpg_psnr_raw"))
      .select(col("n_rows"), col("n_pixels_ok"), col("n_captions_ok"), col("n_phash_ok"),
        col("n_png_ok"), col("n_jpg_ok"),
        (col("min_jpg_psnr_raw") >= JpgPsnrFloor).as("jpg_psnr_above_40"))
}
