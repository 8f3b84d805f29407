package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, OrderStats, Sketches}

class Wave19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("distributedRowNumber equals a window row_number and is partition-count invariant") {
    import spark.implicits._
    val df = graft.Session.table(spark, dir, "orders")
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"),
        col("o_orderkey").as("k"))
    val expect = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("k"))))
      .select("k", "rn").collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = OrderStats.distributedRowNumber(df, parts, col("v"), col("k"))
        .select("k", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("sequence patterns replay a per-user Scala regex scan") {
    val got = Analytics.sequencePatterns(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val evs = graft.Session.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    val expect = evs.map { case (u, rs) =>
      val seq = rs.sortBy(_._2).map(_._3 match {
        case "view" => 'v'; case "click" => 'c'; case "purchase" => 'p'
        case "signup" => 's'; case _ => 'e'
      }).mkString
      (u, (seq.length.toLong,
        "vcp".r.findAllMatchIn(seq).size.toLong,
        "v[ce]*p".r.findAllMatchIn(seq).size.toLong))
    }
    assert(got == expect)
    assert(got.values.map(_._2).sum > 0, "fixture must contain vcp runs")
  }

  test("bitmap intersect equals a direct distinct-user join and is non-degenerate") {
    val got = Sketches.bitmapIntersect(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val base = graft.Session.table(spark, dir, "events")
      .where(col("event_id") % 13 === 0)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = base.groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).toSet) }
    val expect = (for {
      (ta, sa) <- byType; (tb, sb) <- byType if ta < tb
    } yield ((ta, tb), (sa intersect sb).size.toLong)).toMap
    assert(got == expect)
    assert(got.values.toSet.size > 1, "co-active counts must differ across pairs")
  }

  test("RFM: quintile scores are balanced and monotone in their metric") {
    val rows = OrderStats.rfmScores(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // monotone: sort users by (freq, user_id); f_score must be non-decreasing
    val byFreq = rows.sortBy(t => (t._5, t._1)).map(_._3)
    byFreq.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "f_score must be monotone in frequency rank")
      case _ =>
    }
    // balanced quintiles: each score bucket within ceil(n/5) of each other
    val dist = rows.groupBy(_._2).view.mapValues(_.length).values
    assert(dist.max - dist.min <= 1, s"unbalanced r_score quintiles: $dist")
  }
}
