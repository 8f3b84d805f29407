package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, ArrayFns}
import graft.spatial.BoxJoin
import graft.text.TextOps

class Wave17Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("grid clusters match a plain-Scala flood fill over the same hot tiles") {
    // density-relative threshold (bp of total points): 30 bp of sf0.001's
    // 1000 events = 3 absolute — replicate the same derivation below
    val minPtsBp = 30L
    val total = graft.Session.table(spark, dir, "events").count()
    val minPts = math.max(1L, minPtsBp * total / 10000L)
    val got = BoxJoin.gridClusters(spark, dir, minPtsBp).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // replicate: tile counts -> hot set -> flood fill
    val pts = graft.spatial.SpatialQueries.eventPoints(spark, dir)
      .select("lon", "lat").collect()
      .map(r => (math.min(math.floor((r.getDouble(0) + 180.0) / 360.0 * 64.0), 63.0).toLong,
        math.min(math.floor((r.getDouble(1) + 90.0) / 180.0 * 64.0), 63.0).toLong))
    val counts = pts.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val hot = counts.filter(_._2 >= minPts).keySet
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    hot.foreach { t0 =>
      if (!seen.contains(t0)) {
        val comp = scala.collection.mutable.Set.empty[(Long, Long)]
        val stack = scala.collection.mutable.Stack(t0)
        while (stack.nonEmpty) {
          val c = stack.pop()
          if (!seen.contains(c)) {
            seen += c; comp += c
            val (x, y) = c
            Seq((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1))
              .filter(hot.contains).foreach(stack.push)
          }
        }
        val label = comp.map { case (x, y) => x * 64 + y }.min
        expect(label) = (comp.size.toLong, comp.toSeq.map(counts).sum)
      }
    }
    assert(got == expect.toMap && got.nonEmpty)
    assert(got.exists(_._2._1 > 1), "fixture must contain a multi-tile cluster")
  }

  test("term lift replays exact integer lift for every emitted pair") {
    val rows = TextOps.termLift(spark, dir, minCab = 10L).collect()
    assert(rows.nonEmpty)
    val docs = graft.Session.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').toSet))
    val nd = docs.length.toLong
    val cw = docs.flatMap(_._2).groupBy(identity).map { case (w, x) => (w, x.size.toLong) }
    rows.foreach { r =>
      val (wa, wb, cab, lift) = (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(wa < wb)
      val expCab = docs.count(d => d._2.contains(wa) && d._2.contains(wb)).toLong
      assert(cab == expCab)
      assert(lift == (1000000L * nd * cab) / (cw(wa) * cw(wb)))
    }
  }

  test("min-max scaling checksums replay a plain-Scala per-dimension rescale") {
    val got = ArrayFns.minMaxScale(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val vecs = graft.Session.table(spark, dir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val dims = vecs.head._2.length
    val mn = (0 until dims).map(d => vecs.map(_._2(d)).min)
    val mx = (0 until dims).map(d => vecs.map(_._2(d)).max)
    val expect = vecs.map { case (id, v) =>
      val s = (0 until dims).map { d =>
        if (mx(d) == mn(d)) 0L
        else math.floor((v(d) - mn(d)) / (mx(d) - mn(d)) * 1000000.0 + 0.5).toLong
      }.sum
      (id, (dims.toLong, s))
    }.toMap
    assert(got == expect)
  }

  test("MAD anomalies replay plain-Scala order statistics") {
    val got = Analytics.madAnomalies(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val raw = graft.Session.table(spark, dir, "events")
      .select(col("event_type"), floor(col("value") * 100.0 + 0.5).cast("long"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = raw.groupBy(_._1).map { case (g, rs) =>
      def lowerMed(vs: Seq[(Long, Long)]): Long = {
        val sorted = vs.sorted.map(_._1)
        sorted(((sorted.length + 1) / 2 - 1))
      }
      val med = lowerMed(rs.map(t => (t._2, t._3)).toSeq)
      val mad = lowerMed(rs.map(t => (math.abs(t._2 - med), t._3)).toSeq)
      val anom = rs.count(t => math.abs(t._2 - med) > 3 * mad).toLong
      (g, (med, mad, anom, rs.size.toLong))
    }
    assert(got == expect)
  }
}
