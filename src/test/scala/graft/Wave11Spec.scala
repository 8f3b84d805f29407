package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Graph}

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Plain-Scala replica of the synth edge fixture. */
  private def edges(n: Int, m: Int): Set[(Long, Long)] =
    (0 until m).flatMap { i =>
      val u = (graft.synth.ImageSynth.mix(2L * i) & 0x7FFFFFFFL) % n
      val v = (graft.synth.ImageSynth.mix(2L * i + 1) & 0x7FFFFFFFL) % n
      if (u != v) Some((math.min(u, v), math.max(u, v))) else None
    }.toSet

  test("triangle counts match an adjacency-set brute force") {
    val n = 60; val m = 300
    val es = edges(n, m)
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    es.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val tris = es.flatMap { case (a, b) =>
      (adj(a) intersect adj(b)).map(c => List(a, b, c).sorted match {
        case List(x, y, z) => (x, y, z)
      })
    }
    val expect = tris.toSeq.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val got = Graph.triangleCounts(spark, n, m).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
    // each triangle contributes exactly 3 corner increments
    assert(got.values.sum == 3L * tris.size && tris.nonEmpty)
  }

  test("pagerank replays an exact-integer plain-Scala reference, every digit") {
    val n = 40; val m = 200; val iters = 6
    val dedges = (0 until m).flatMap { i =>
      val u = (graft.synth.ImageSynth.mix(2L * i) & 0x7FFFFFFFL) % n
      val v = (graft.synth.ImageSynth.mix(2L * i + 1) & 0x7FFFFFFFL) % n
      if (u != v) Some((u, v)) else None
    }.toSet
    val od = dedges.groupBy(_._1).map { case (u, es) => (u, es.size.toLong) }
    val r0 = (BigInt(10).pow(12) / n).toLong
    val base = (BigInt(15) * BigInt(10).pow(12) / (BigInt(100) * n)).toLong
    var r = Array.fill(n)(r0)
    for (_ <- 1 to iters) {
      val nxt = Array.fill(n)(base)
      dedges.foreach { case (u, v) =>
        nxt(v.toInt) += (85L * r(u.toInt)) / (100L * od(u))
      }
      r = nxt
    }
    val got = Graph.pageRank(spark, n, m, iters).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got == r.indices.map(i => (i.toLong, r(i))).toMap)
  }

  test("pagerank mass never exceeds the closed-system bound (sink mass only evaporates)") {
    val n = 40; val m = 200
    val total = Graph.pageRank(spark, n, m, iters = 4)
      .agg(sum("r")).head().getLong(0)
    assert(total > 0 && total <= BigInt(10).pow(12).toLong)
  }
}

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("cohort retention: offset-0 actives reconstruct the full user universe") {
    val rows = Analytics.cohortRetention(spark, dir).collect()
    val day0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = graft.Session.table(spark, dir, "events")
      .where(col("event_id") % 50 === 0)
      .select("user_id").distinct().count()
    assert(day0 == users, "every user is active on their own cohort day")
    assert(rows.forall(_.getLong(1) >= 0L), "offsets are never negative")
  }

  test("funnel fold matches a plain-Scala event-scan per user, and stages chain strictly") {
    val got = Analytics.funnel(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    val evs = graft.Session.table(spark, dir, "events")
      .where(col("event_id") % 11 === 0)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    val expect = evs.map { case (u, rows) =>
      var t1 = -1L; var t2 = -1L; var t3 = -1L
      rows.sortBy(_._2).foreach { case (_, us, ty) =>
        if (t1 == -1L && ty == "view") t1 = us
        else if (t1 != -1L && t2 == -1L && ty == "click" && us > t1) t2 = us
        else if (t2 != -1L && t3 == -1L && ty == "purchase" && us > t2) t3 = us
      }
      val stage = if (t3 != -1L) 3L else if (t2 != -1L) 2L else if (t1 != -1L) 1L else 0L
      (u, (stage, t1, t2, t3))
    }
    assert(got == expect)
    got.values.foreach { case (_, t1, t2, t3) =>
      if (t2 != -1L) assert(t1 != -1L && t1 < t2)
      if (t3 != -1L) assert(t2 != -1L && t2 < t3)
    }
    // non-vacuous: at least two distinct stages occur in the fixture
    assert(got.values.map(_._1).toSet.size >= 2)
  }

  test("EMA fold replays the integer recurrence from a plain-Scala scan") {
    val got = Analytics.emaFold(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val expect = graft.Session.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rows) =>
        var ema = -1L
        rows.sortBy(_._2).foreach { case (_, _, v) =>
          val cents = math.floor(v * 100.0 + 0.5).toLong * 1000000L
          ema = if (ema == -1L) cents else (3L * cents + 7L * ema) / 10L
        }
        (u, (ema, rows.size.toLong))
      }
    assert(got == expect)
  }
}
