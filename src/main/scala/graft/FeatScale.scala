package graft

import java.util.concurrent.atomic.AtomicLong

/** Dev probe: raw multithreaded feature-derivation throughput without Spark —
  * the exact per-row work of the pipeline scan stage (seed mix → geotag →
  * quadkey/hex/s2 encode → PIP) over reused index objects, isolating
  * JVM/host scaling from executor machinery.
  * `runMain graft.FeatScale <threads> <rowsPerThread>` */
object FeatScale {
  def main(args: Array[String]): Unit = {
    val t = args(0).toInt
    val n = if (args.length > 1) args(1).toLong else 20000000L
    val index = new graft.spatial.BoundaryIndex(
      graft.pipeline.ImagePipeline.metroBoundaries.toArray)
    val sink = new AtomicLong()
    // warm-up
    var wi = 0L
    var acc = 0L
    while (wi < 2000000L) { acc += work(wi, index); wi += 1 }
    sink.addAndGet(acc)
    val t0 = System.nanoTime()
    val threads = (0 until t).map { ti =>
      new Thread(() => {
        var i = ti.toLong * 1000000000L
        val end = i + n
        var a = 0L
        while (i < end) { a += work(i, index); i += 1 }
        sink.addAndGet(a)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"threads=$t rows=${t * n} rows_per_s=${t * n / sec}%.0f per_thread=${t * n / sec / t}%.0f sink=${sink.get}")
  }

  @inline private def work(i: Long, index: graft.spatial.BoundaryIndex): Long = {
    import graft.functions.Statics
    val lon = Statics.geotagLon(i)
    val lat = Statics.geotagLat(i)
    val uid = Statics.metaUid(i)
    val tile = Statics.quadCell(lat, lon, 12)
    val hex = Statics.hexCell(lat, lon, 7)
    val s2 = Statics.s2Cell(lat, lon, 12)
    val b = index.queryFirstOrdinal(lon, lat)
    uid + tile + hex + s2 + b
  }
}
