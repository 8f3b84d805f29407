package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Analytics
import graft.spatial.BoxJoin
import graft.text.Dedup

class Wave16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("adaptive tiles: mass conservation, fine tiles only under hot parents, rollup consistency") {
    val cap = 15L
    val rows = BoxJoin.adaptiveTiles(spark, dir, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nPts = graft.Session.table(spark, dir, "events").count()
    assert(rows.map(_._4).sum == nPts, "tile counts must partition the points")
    val coarse = rows.filter(_._3 == 6L)
    val fine = rows.filter(_._3 == 8L)
    assert(coarse.nonEmpty)
    coarse.foreach { case (_, _, _, n) => assert(n <= cap, "a hot tile stayed coarse") }
    // every fine tile's parent must be hot (sum of siblings > cap)
    fine.groupBy(t => (t._1 / 4, t._2 / 4)).foreach { case (p, kids) =>
      assert(kids.map(_._4).sum > cap, s"fine tiles under a cold parent $p")
    }
    // no tile appears at both levels under the same parent
    val coarseSet = coarse.map(t => (t._1, t._2)).toSet
    fine.foreach { t => assert(!coarseSet.contains((t._1 / 4, t._2 / 4))) }
  }

  test("grouped trend: moments and rational slope match a plain-Scala fit") {
    val got = Analytics.groupedTrend(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val raw = graft.Session.table(spark, dir, "events")
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = raw.groupBy(_._1).map { case (g, rs) =>
      val dc = rs.groupBy(_._2).map { case (d, xs) => (d, xs.size.toLong) }.toSeq
      val n = dc.size.toLong
      val sx = dc.map(_._1).sum; val sy = dc.map(_._2).sum
      val sxy = dc.map(t => t._1 * t._2).sum; val sxx = dc.map(t => t._1 * t._1).sum
      (g, (n, sx, sy, sxy, sxx, n * sxy - sx * sy, n * sxx - sx * sx))
    }
    assert(got == expect)
  }

  test("prefix-filter join: recall 1 vs in-Spark brute force, and the prefix really prunes") {
    val tau = (6, 10)
    val got = Dedup.prefixFilterJoin(spark, dir, tau._1, tau._2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute force over collected shingle sets
    val docs = graft.Session.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(' ').sliding(3).map(_.mkString(" ")).toSet))
      .filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      c = (sa intersect sb).size.toLong
      u = sa.size + sb.size - c
      if c * tau._2 >= u * tau._1
    } yield (a, b, c, u)).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("markov transitions: counts replay a per-user sequence scan; rows sum to 1e6 - rounding") {
    val got = Analytics.markovTransitions(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val evs = graft.Session.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    evs.values.foreach { rs =>
      rs.sortBy(_._2).map(_._3).sliding(2).foreach { w =>
        if (w.length == 2) cnt((w(0), w(1))) = cnt((w(0), w(1))) + 1
      }
    }
    assert(got.view.mapValues(_._1).toMap == cnt.toMap)
    // per-from row: floor-normalized probs sum within 1e6 and above 1e6 - k
    got.groupBy(_._1._1).foreach { case (_, row) =>
      val s = row.values.map(_._2).sum
      assert(s <= 1000000L && s > 1000000L - row.size)
    }
  }
}
