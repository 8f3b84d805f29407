package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Lakehouse, OrderStats}
import graft.synth.ImageSynth.mix

class Wave21Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("stratified sample is reproducible, k-per-stratum, and hash-minimal") {
    val a = Analytics.stratifiedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Analytics.stratifiedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "rerun must pick the SAME rows")
    val perType = a.groupBy(_._1)
    perType.foreach { case (_, rows) => assert(rows.size == 3) }
    // the chosen ids really have the smallest masked hashes in their stratum
    val all = graft.Session.table(spark, dir, "events")
      .select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    all.groupBy(_._1).foreach { case (t, rows) =>
      val want = rows.map(_._2)
        .sortBy(id => (mix(id) & Long.MaxValue, id)).take(3).toSet
      assert(perType(t).map(_._2) == want, s"stratum $t")
    }
  }

  test("share-of-total: per-group shares and final cumulative share reach ~1e6") {
    val rows = Analytics.shareOfTotal(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - g.size, "floor-shares sum within rounding")
      val last = g.maxBy(_._2)
      assert(last._5 == 1000000L, "final cumulative share must be exactly 1e6")
      g.sortBy(_._2).map(_._5).sliding(2).foreach {
        case Array(x, y) => assert(x <= y, "cumulative share must be monotone")
        case _ =>
      }
    }
  }

  test("temporal join: every match is the unique valid version at t") {
    val got = Lakehouse.temporalJoin(spark).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    // replicate SCD + probes in Scala
    val deltas = (0 until 400).map { s =>
      (s.toLong, (mix(5000000L + s) & 0x7FFFFFFFL) % 1000,
        (mix(6000000L + s) & 0x7FFFFFFFL) % 3, mix(7000000L + s) & 0xFFFFL)
    }
    val versions = deltas.groupBy(_._2).flatMap { case (k, ds) =>
      val sorted = ds.sortBy(_._1)
      sorted.zipWithIndex.collect {
        case ((seq, _, op, v), i) if op != 2 =>
          val vt = if (i + 1 < sorted.length) Some(sorted(i + 1)._1) else None
          (k, seq, v, vt)
      }
    }.toSeq
    val expect = (0 until 600).flatMap { i =>
      val k = (mix(8000000L + i) & 0x7FFFFFFFL) % 1000
      val t = (mix(9000000L + i) & 0x7FFFFFFFL) % 450
      versions.filter(v => v._1 == k && t >= v._2 && v._4.forall(t < _))
        .map(v => (i.toLong, (k, t, v._3, v._2)))
    }
    assert(got.toMap == expect.toMap && got.length == expect.length)
    assert(got.map(_._1).distinct.length == got.length,
      "disjoint intervals: at most one version per probe")
  }

  test("skew profile replays a plain-Scala ranking") {
    val row = OrderStats.skewProfile(spark, dir).head()
    val counts = graft.Session.table(spark, dir, "lineitem")
      .groupBy("l_partkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ranked = counts.sortBy(t => (-t._2, t._1)).map(_._2)
    val total = ranked.sum
    assert(row.getLong(0) == ranked.length && row.getLong(1) == total)
    assert(row.getLong(2) == ranked.head)
    assert(row.getLong(3) == ranked.take(10).sum)
    assert(row.getLong(4) == ranked.take((ranked.length / 100 + 1).toInt).sum)
    assert(row.getLong(5) == 1000000L * ranked.head / total)
  }
}
