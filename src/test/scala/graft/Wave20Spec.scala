package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Graph, Sessionize}
import graft.synth.ImageSynth.mix

class Wave20Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("pointer-jumping depths equal a sequential parent chase") {
    val n = 500
    val got = Graph.treeDepths(spark, n).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val par = (1 until n).map(i =>
      (i.toLong, (mix(61453L + i) & Long.MaxValue) % i)).toMap + (0L -> 0L)
    def depth(i: Long): Long = {
      var x = i; var d = 0L
      while (x != 0L) { x = par(x); d += 1 }
      d
    }
    val expect = (0 until n).map(i => (i.toLong, depth(i))).toMap
    assert(got == expect)
    assert(expect.values.max >= 8, "fixture tree must be deep enough to need >=3 jumps")
  }

  test("interval coalescing handles containment and replays a Scala sweep") {
    val got = Sessionize.intervalCoalesce(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val evs = graft.Session.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val expect = evs.map { case (u, rs) =>
      val iv = rs.map(t => (t._2, t._2 + 600000000L)).sorted
      var islands = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      iv.foreach { case (s, e) =>
        if (curE == Long.MinValue || s > curE) {
          if (curE != Long.MinValue) covered += curE - curS
          islands += 1; curS = s; curE = e
        } else curE = math.max(curE, e)
      }
      if (curE != Long.MinValue) covered += curE - curS
      (u, (islands, covered))
    }
    assert(got == expect)
  }

  test("rolling 7-day distinct equals a direct per-day recount") {
    val got = Analytics.rollingDistinct(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pres = graft.Session.table(spark, dir, "events")
      .where(col("event_id") % 29 === 0)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = pres.map(_._2).distinct
    val expect = days.map { d =>
      (d, pres.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.length.toLong)
    }.toMap
    assert(got == expect && got.nonEmpty)
    assert(got.values.toSet.size > 1, "rolling counts must vary (non-saturated fixture)")
  }
}
