package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Analytics

class Wave22Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("gini splits: exact rational impurity, bounded by the k-class maximum") {
    val rows = Analytics.giniSplits(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // replicate from raw counts
    val raw = graft.Session.table(spark, dir, "events")
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = raw.groupBy(_._1).map { case (d, rs) =>
      val cs = rs.groupBy(_._2).map(_._2.size.toLong)
      val n = cs.sum; val ssq = cs.map(c => c * c).sum
      (d, (n, (n * n - ssq) * 1000000L / (n * n)))
    }
    assert(rows.map(t => (t._1, (t._2, t._3))).toMap == expect)
    // 5 classes: gini <= 1 - 1/5 = 0.8
    rows.foreach(t => assert(t._3 <= 800000L))
  }

  test("event correlation: pairs replay a per-user time scan and respect the window") {
    val got = Analytics.eventCorrelation(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val evs = graft.Session.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val expect = evs.flatMap { case (u, rs) =>
      val ps = rs.filter(_._2 == "purchase").map(t => (t._3, t._4))
      val es = rs.filter(_._2 == "error").map(_._4)
      val pairs = for {
        (pid, pus) <- ps; eus <- es
        if eus > pus && eus <= pus + 43200000000L
      } yield (pid, eus)
      if (pairs.isEmpty) None
      else Some((u, (pairs.size.toLong, pairs.map(_._1).distinct.size.toLong)))
    }
    assert(got == expect && got.nonEmpty)
  }
}
