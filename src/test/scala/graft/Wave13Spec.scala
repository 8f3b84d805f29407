package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Pyramid
import graft.ops.Sessionize
import graft.synth.ImageSynth

class Wave13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  /** The closed forms the q116/q117 oracles rely on, proven against a direct
    * per-pixel render + downsample (the same derivation chain, in code). */
  test("block closed forms: integral 64b+1568, level-1 16b+384, level-2 4b+96") {
    for (i <- 0L until 24L) {
      val seed = ImageSynth.seedOf(i)
      val img = ImageSynth.render(seed, 32, 64)
      val buf = new Array[Int](32 * 64)
      img.getRGB(0, 0, 32, 64, buf, 0, 32)
      val g = Array.tabulate(64, 32)((y, x) => (buf(y * 32 + x) & 0xFF).toLong)
      def down(m: Array[Array[Long]]) =
        Array.tabulate(m.length / 2, m(0).length / 2)((y, x) =>
          (m(2 * y)(2 * x) + m(2 * y)(2 * x + 1) +
            m(2 * y + 1)(2 * x) + m(2 * y + 1)(2 * x + 1)) / 4)
      val bases = for (by <- 0 until 8; bx <- 0 until 4)
        yield ImageSynth.mix(seed ^ (by.toLong << 32) ^ bx.toLong) & 0xBF
      assert(g.map(_.sum).sum == bases.map(64L * _).sum + bases.size * 1568L)
      val l1 = down(g); val l2 = down(l1)
      assert(l1.map(_.sum).sum == bases.map(16L * _).sum + bases.size * 384L)
      assert(l2.map(_.sum).sum == bases.map(4L * _).sum + bases.size * 96L)
    }
  }

  test("imageIntegral: engine rows equal a direct decode-and-sum of the same bytes") {
    val got = Pyramid.imageIntegral(spark, n = 60, parts = 2).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    val direct = graft.pipeline.ImagePipeline.synthTable(spark, 60, 2)
      .filter(_.fmt == "png").collect().map { r =>
        val img = graft.pipeline.Validate.decode(r.bytes, r.fmt)
        val buf = new Array[Int](r.w * r.h)
        img.getRGB(0, 0, r.w, r.h, buf, 0, r.w)
        (r.image_id.stripPrefix("img").toLong,
          (r.w, r.h, buf.map(p => (p & 0xFF).toLong).sum))
      }.toMap
    assert(got == direct && got.nonEmpty)
  }

  test("pyramid sums: level sums shrink ~4x and match the closed form via the oracle identity") {
    val rows = Pyramid.pyramidSums(spark, n = 60, parts = 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l1 = r.getLong(1); val l2 = r.getLong(2)
      // floor-mean halving: the level-2 total is ~1/4 of level-1 (exactly
      // (l1 - extras)/4 by the closed forms; bound it without re-deriving)
      assert(l2 * 4 <= l1 && l1 <= (l2 + 1) * 4 + 4096)
    }
  }

  test("stay segments replay a plain-Scala haversine segmentation") {
    val got = Sessionize.staySegments(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val evs = graft.Session.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def hav(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      val sLat = math.sin(math.toRadians(la2 - la1) / 2)
      val sLon = math.sin(math.toRadians(lo2 - lo1) / 2)
      val a = sLat * sLat +
        math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) * sLon * sLon
      2.0 * 6371.0088 * math.asin(math.min(1.0, math.sqrt(a)))
    }
    val expect = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Long, Long)]
    evs.foreach { case (u, rows) =>
      val lat = (u % 181 - 90).toDouble
      var sid = 0L; var plon = Double.NaN
      val acc = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
      rows.sortBy(_._2).foreach { case (_, us, v) =>
        val lon = v % 360.0 - 180.0
        val d = if (plon.isNaN) Double.MaxValue else hav(lat, plon, lat, lon)
        val brk = d > 6000.0
        if (brk) sid += 1
        val step = if (brk) 0L else math.floor(d * 1000000.0 + 0.5).toLong
        val cur = acc.getOrElse(sid, (0L, Long.MaxValue, Long.MinValue, 0L))
        acc(sid) = (cur._1 + 1, math.min(cur._2, us), math.max(cur._3, us),
          cur._4 + step)
        plon = lon
      }
      acc.foreach { case (s, t) => expect((u, s)) = t }
    }
    assert(got == expect.toMap)
  }
}
