package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import graft.synth.ImageSynth
import graft.pipeline.Validate

/** Dev utility: PSNR distribution of the jpg roundtrip + phash/caption
  * self-consistency, without Spark. `runMain graft.SynthCheck [n]` */
object SynthCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    var minPsnr = Double.MaxValue
    var jpgCount = 0; var pngBad = 0; var captionBad = 0
    var sizeSum = 0L
    val t0 = System.nanoTime()
    var i = 0L
    while (i < n) {
      val row = ImageSynth.rowOf(i)
      sizeSum += row.bytes.length
      val decoded = ImageIO.read(new ByteArrayInputStream(row.bytes))
      val seed = ImageSynth.seedOf(i)
      val ref = ImageSynth.render(seed, decoded.getWidth, decoded.getHeight)
      val p = Validate.psnr(decoded, ref)
      if (row.fmt == "jpg") { jpgCount += 1; if (p < minPsnr) minPsnr = p }
      else if (!p.isPosInfinity) pngBad += 1
      val (uid, team, day, _, _) = ImageSynth.metaOf(seed)
      if (row.caption != ImageSynth.captionOf(seed, uid, team, day)) captionBad += 1
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"n=$n jpg=$jpgCount minJpgPsnr=$minPsnr%.2f pngBad=$pngBad captionBad=$captionBad " +
      f"avgBytes=${sizeSum / n} rate=${n / dt}%.0f rows/s")
  }
}
