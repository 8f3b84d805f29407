package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Lakehouse
import graft.synth.ImageSynth.mix

class Wave14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Plain-Scala replica of the CDC fixture. */
  private val nBase = 800; private val nDelta = 400; private val keyspace = 1000
  private def baseMap: Map[Long, Long] =
    (0 until nBase).map(k => (k.toLong, mix(k.toLong ^ 0xBA5EL) & 0xFFFFL)).toMap
  private def deltas: Seq[(Long, Long, Long, Long)] = // seq, key, op, val
    (0 until nDelta).map { s =>
      (s.toLong, (mix(5000000L + s) & 0x7FFFFFFFL) % keyspace,
        (mix(6000000L + s) & 0x7FFFFFFFL) % 3, mix(7000000L + s) & 0xFFFFL)
    }
  private def mergedMap: Map[Long, Long] = {
    val m = scala.collection.mutable.Map.empty[Long, Long] ++ baseMap
    deltas.groupBy(_._2).foreach { case (k, ds) =>
      val last = ds.maxBy(_._1)
      if (last._3 == 2) m.remove(k) else m(k) = last._4
    }
    m.toMap
  }

  test("cdc merge: latest-op-wins semantics replay a plain-Scala apply") {
    val got = Lakehouse.mergeApply(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == mergedMap)
    // src tag: every touched key is 'delta', untouched base keys are 'base'
    val touched = deltas.map(_._2).toSet
    Lakehouse.mergeApply(spark).collect().foreach { r =>
      assert((r.getString(2) == "delta") == touched.contains(r.getLong(0)))
    }
  }

  test("scd2: intervals chain without overlap, exactly one current per live key") {
    val rows = Lakehouse.scd2(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val sorted = ivs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 != -1L && a._4 <= b._2, s"overlap at key $k")
        case _ =>
      }
      // at most one open interval; it must be the key's last delta op
      val open = sorted.filter(_._4 == -1L)
      assert(open.length <= 1)
      val last = deltas.filter(_._2 == k).maxBy(_._1)
      if (last._3 != 2) assert(open.length == 1 && open.head._2 == last._1)
      else assert(open.isEmpty, s"deleted key $k must close all intervals")
    }
    assert(rows.count(_._5 == 1L) == rows.count(_._4 == -1L))
  }

  test("change feed applied to base reproduces the merged snapshot") {
    val feed = Lakehouse.changeFeed(spark).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val m = scala.collection.mutable.Map.empty[Long, Long] ++ baseMap
    feed.foreach {
      case (k, "insert", _, nv) => assert(!m.contains(k)); m(k) = nv
      case (k, "delete", ov, _) => assert(m(k) == ov); m.remove(k)
      case (k, "update", ov, nv) => assert(m(k) == ov && ov != nv); m(k) = nv
      case other => fail(s"unexpected feed row $other")
    }
    assert(m.toMap == mergedMap)
  }

  test("compaction plan: job totals bounded by target + max candidate, ranges contiguous") {
    val rows = Lakehouse.compactionPlan(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, bytes, _, _) =>
      assert(n >= 1 && bytes < 256000000L + 32000000L)
    }
    // within a bucket, job file-ranges must not interleave
    rows.groupBy(_._1).foreach { case (_, js) =>
      js.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, "job ranges interleave")
        case _ =>
      }
    }
  }

  test("time travel: as-of-0 read returns exactly the epoch-0 id domain") {
    val rows = graft.pipeline.Checkpoint.timeTravelGate(spark, 120L, 200L)
      .collect()
    val total = rows.map(_.getLong(1)).sum
    val maxIdx = rows.map(_.getLong(4)).max
    val sumIdx = rows.map(_.getLong(2)).sum
    assert(total == 120L, "row count must equal the epoch-0 domain")
    assert(maxIdx < 120L, "no epoch-1 id may leak into the as-of read")
    assert(sumIdx == (0L until 120L).sum)
  }
}
