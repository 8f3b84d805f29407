package graft

import java.util.concurrent.atomic.AtomicLong

/** Dev probe: raw multithreaded image synth+validate throughput without
  * Spark — isolates ImageIO/AWT scaling from executor machinery.
  * `runMain graft.ImgScale <threads> <rowsPerThread>` */
object ImgScale {
  def main(args: Array[String]): Unit = {
    val t = args(0).toInt
    val n = if (args.length > 1) args(1).toLong else 20000L
    val done = new AtomicLong()
    // warm-up: let C2 finish compiling the codec paths before saturating all
    // pinned CPUs (otherwise the run is bimodal: interpreted vs compiled)
    var wi = 900000000L
    while (wi < 900020000L) {
      val row = graft.synth.ImageSynth.rowOf(wi)
      graft.pipeline.Validate.decode(row.bytes, row.fmt)
      wi += 1
    }
    val t0 = System.nanoTime()
    val threads = (0 until t).map { ti =>
      new Thread(() => {
        var i = ti.toLong * 1000000L
        val end = i + n
        while (i < end) {
          val row = graft.synth.ImageSynth.rowOf(i)
          val img = graft.pipeline.Validate.decode(row.bytes, row.fmt)
          val ref = graft.synth.ImageSynth.render(graft.synth.ImageSynth.seedOf(i), img.getWidth, img.getHeight)
          val p = graft.pipeline.Validate.psnr(img, ref)
          if (p < 40) println(s"LOW $i $p")
          i += 1
        }
        done.addAndGet(n)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"threads=$t rows=${done.get} rows/s=${done.get / sec}%.0f per_thread=${done.get / sec / t}%.0f")
  }
}
