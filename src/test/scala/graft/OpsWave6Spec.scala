package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Session.table
import graft.ops.{BloomJoin, MultiRollup, Sessionize}

/** Specs for the wave-6 operators (q88-q90): each pins the result against an
  * independent reference AND the plan property the operator exists for. */
object Wave6 {
  /** AQE's plan string prints BOTH "Final Plan" and "Initial Plan" — count
    * structural nodes only in the final (executed) section. */
  def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(finalPlan(df)).length
}
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("no false negatives; false-positive rate within the sizing envelope") {
    import spark.implicits._
    val n = 5000
    val inserted = spark.range(0, n).select(col("id").as("k"))
    val bloom = BloomJoin.build(inserted, "k", m = 1 << 16, k = 3)
    // every inserted key must pass — a Bloom filter's one hard guarantee
    val passIn = inserted.filter(BloomJoin.mightContain(col("k"), bloom, 3)).count()
    assert(passIn == n, s"false negatives: only $passIn/$n inserted keys pass")
    // disjoint probe set: ~13 bits/key, k=3 → expected fp ~0.9%; bound at 5%
    val probes = 20000
    val fp = spark.range(1000000000L, 1000000000L + probes).select(col("id").as("k"))
      .filter(BloomJoin.mightContain(col("k"), bloom, 3)).count()
    assert(fp < probes * 0.05, s"fp rate ${fp.toDouble / probes} exceeds 5%")
  }

  test("pruned join equals the unpruned relation; filter is codegen, join stays SMJ") {
    val pruned = BloomJoin.urgentRevenue(spark, dir)
    val urgent = table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val plain = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      .hint("merge").join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("revenue_cents"))
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(toSet(pruned) == toSet(plain))
    assert(toSet(pruned).nonEmpty)

    // the filter actually prunes: probe rows surviving the bloom are a strict
    // subset of lineitem (urgent orders are ~20% of the table, fp ~1%)
    val li = table(spark, dir, "lineitem")
    val bloom = BloomJoin.build(urgent, "o_orderkey", 1 << 17, 3)
    val kept = li.filter(BloomJoin.mightContain(col("l_orderkey"), bloom, 3)).count()
    val total = li.count()
    assert(kept < total / 2, s"bloom kept $kept of $total probe rows — no pruning")

    // plan: the membership test is pure Column algebra (getbit — codegen),
    // and the merge hint kept the join a shuffle join (where pruning matters)
    pruned.count()
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("getbit"), s"bloom probe not in plan:\n${p.take(800)}")
    assert(p.contains("SortMergeJoin"), s"join not SMJ:\n${p.take(800)}")
    assert(!p.contains("BroadcastHashJoin"), "broadcast crept in — the gate " +
      "would no longer exercise the shuffle path pruning exists for")
  }
}

class MultiRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("cube levels are mutually consistent; one Expand, one exchange") {
    val out = MultiRollup.volumeCube(spark, dir)
    val rows = out.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = table(spark, dir, "lineitem").count()
    // gid bit semantics: MSB = l_returnflag aggregated away
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1 && grand.head._4 == total)
    assert(grand.head._1.isEmpty && grand.head._2.isEmpty)
    // every level's n_items sums to the table count, and each level's
    // qty_cents re-aggregates to the grand total — the cross-level invariant
    for (g <- Seq(0L, 1L, 2L, 3L)) {
      val lvl = rows.filter(_._3 == g)
      assert(lvl.map(_._4).sum == total, s"gid=$g n_items mismatch")
      assert(lvl.map(_._5).sum == grand.head._5, s"gid=$g qty_cents mismatch")
    }
    // the point of CUBE: one scan, one Expand, one aggregation exchange
    val p = Wave6.finalPlan(out)
    assert(p.contains("Expand"), s"no Expand in cube plan:\n${p.take(600)}")
    assert(Wave6.exchanges(out) == 1,
      s"expected 1 exchange, saw ${Wave6.exchanges(out)}:\n${p.take(1200)}")
  }
}

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("sessions match a per-user scan reference; windows + rollup share ONE exchange") {
    val gap = 30L * 60 * 1000000
    val out = Sessionize.sessions(spark, dir)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet

    // plain-Scala reference: sorted scan per user, greedy gap split
    val rows = table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(_._2)
      var sid = 0L; var prev = Long.MinValue
      sorted.map { case (_, us, vc) =>
        if (prev == Long.MinValue || us - prev > gap) sid += 1
        prev = us
        (uid, sid, us, vc)
      }.groupBy(_._2).map { case (s, g) =>
        (uid, s, g.map(_._3).min, g.map(_._3).max, g.size.toLong, g.map(_._4).sum)
      }
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // sessions actually split: more sessions than users, fewer than events
    val users = rows.map(_._1).distinct.length
    assert(got.size > users && got.size < rows.length)

    // scale shape: lag, running sum, and the (user, sid) rollup all reuse the
    // single hash exchange on user_id (HashPartitioning(user_id) satisfies
    // the two-key clustered distribution)
    out.count()
    assert(Wave6.exchanges(out) == 1,
      s"expected 1 exchange, saw ${Wave6.exchanges(out)}:\n${Wave6.finalPlan(out).take(1200)}")
  }
}
