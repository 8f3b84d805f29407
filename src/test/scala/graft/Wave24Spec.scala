package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Storage

class Wave24Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("encoding advisor: runs replayed for one column, thresholds honored") {
    val got = Storage.encodingAdvisor(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(got.keySet == Set("l_returnflag", "l_linestatus", "l_suppkey", "l_partkey"))
    // driver replay for l_returnflag: group by orderkey, sort by the same
    // total key, count value changes
    val rows = graft.Session.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val runs = rows.groupBy(_._1).values.map { g =>
      val vs = g.sortBy(t => (t._2, t._3, t._4, t._5)).map(_._5)
      1L + vs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    }.sum
    val (nRows, nDistinct, nRuns, avgE6, rec) = got("l_returnflag")
    assert(nRows == rows.length && nDistinct == rows.map(_._5).distinct.length)
    assert(nRuns == runs && avgE6 == nRows * 1000000L / nRuns)
    assert(rec == (if (nRuns * 4 <= nRows) "RLE"
                   else if (nDistinct * 20 <= nRows) "DICT" else "PLAIN"))
  }

  test("zone maps: out-of-range predicate skips every file; scanned rows bound") {
    val got = Storage.zoneMapSim(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    val total = graft.Session.table(spark, dir, "lineitem").count()
    val nFiles = got(1L)._1
    // predicate 3 (1990) is before the data's date range: all files skipped
    assert(got(3L) == ((nFiles, nFiles, 0L)))
    got.values.foreach { case (f, s, rows) =>
      assert(f == nFiles && s <= f && rows <= total)
      if (s == 0) assert(rows == total)
    }
    // the single-day predicate must skip at least as many files as the
    // half-year one that contains it
    assert(got(4L)._2 >= got(1L)._2)
  }

  test("merkle diff: differing buckets are exactly those holding a perturbed key") {
    val got = Storage.merkleDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val keys = graft.Session.table(spark, dir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    val expectBuckets = keys.filter(_ % 97 == 0).map(_ / 64).toSet
    assert(got.map(_._1).toSet == expectBuckets && got.nonEmpty)
    // counts match the bucket population; digests genuinely differ
    val byBucket = keys.groupBy(_ / 64).map { case (b, ks) => (b, ks.length.toLong) }
    got.foreach { case (b, n, s, d) =>
      assert(n == byBucket(b) && s != d)
    }
  }
}
