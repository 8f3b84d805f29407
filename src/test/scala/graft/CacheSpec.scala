package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Pins the eager-free guarantee (ADVICE r4): freeLocalCheckpoint must
  * actually free — and must SAY so, so a Spark plan-wrapping change cannot
  * silently disable the block hygiene of the iterative operators. */
class CacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("freeLocalCheckpoint frees a localCheckpoint'd frame and reports it") {
    import spark.implicits._
    val df = spark.range(100).toDF("x").localCheckpoint()
    val rdd = df.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    assert(rdd.getStorageLevel.useMemory || rdd.getStorageLevel.useDisk)
    assert(CacheOps.freeLocalCheckpoint(df))
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("freeLocalCheckpoint returns false (does not throw) on a non-checkpointed plan") {
    assert(!CacheOps.freeLocalCheckpoint(spark.range(10).toDF("x")))
  }
}

/** Adversarial pins for dupComponents' loop mechanics (VERDICT r4 #5/#6):
  * exactly one Spark action per propagation round, and the hard-diameter
  * refusal actually refuses — loudly — instead of silently splitting
  * components. */
class DupComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pathPairs(edges: Int) = {
    import spark.implicits._
    (0 until edges).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
  }

  test("one Spark action per round: accumulator convergence, no count action") {
    // 4-edge chain: label 0 moves 1 hop/round -> 4 change rounds + 1
    // zero-change round = 5 rounds total. Action budget: edges checkpoint +
    // initial labels checkpoint + 5 round materializations + rollup
    // checkpoint = 8 localCheckpoint actions, ZERO `count` actions (job
    // counting is the wrong probe here — AQE splits one action into several
    // jobs; QueryExecutionListener events map 1:1 to driver actions). The
    // round-4 shape ran a join+count convergence probe per round: it would
    // show 5 `count` events.
    val pairs = pathPairs(4)
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    durationNs: Long): Unit = names.add(funcName)
      def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    exception: Exception): Unit = names.add("FAIL:" + funcName)
    }
    spark.listenerManager.register(listener)
    try {
      val out = Dedup.dupComponents(pairs)
      // the listener bus is async: poll until quiet (stable across 4 polls)
      var last = -1; var stable = 0; var waited = 0
      while (stable < 4 && waited < 5000) {
        Thread.sleep(50); waited += 50
        val cur = names.size()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val evs = names.toArray(Array.empty[String]).toSeq
      assert(evs.count(_ == "localCheckpoint") == 8,
        s"expected 8 localCheckpoint actions (1/round + 3), saw $evs")
      assert(!evs.exists(_.contains("count")),
        s"per-round count action resurfaced: $evs")
      assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 5L)))
    } finally spark.listenerManager.unregister(listener)
  }

  test("path graph converging exactly at the round cap still succeeds") {
    // 12-edge path: 12 change rounds + 1 zero round = 13 = maxRounds exactly
    val out = Dedup.dupComponents(pathPairs(12), maxRounds = 13).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((0L, 13L, 12L)))
  }

  test("diameter over the round cap trips the loud refusal, never a silent split") {
    val ex = intercept[IllegalArgumentException] {
      Dedup.dupComponents(pathPairs(13), maxRounds = 13).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("large/small-star converges on a 200-edge path where hash-min's cap refuses") {
    // hash-min needs diameter+1 = 201 rounds here (cap 64 would refuse);
    // the star contraction lands the same single component in O(log²) rounds
    val out = Dedup.dupComponentsStars(pathPairs(200), maxRounds = 64).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((0L, 201L, 200L)))
  }

  test("large/small-star equals hash-min on random graphs (property)") {
    import spark.implicits._
    val rng = new Prop.Rng(77)
    for (trial <- 1 to 8) {
      val nVerts = rng.int(20, 80)
      val nEdges = rng.int(10, 90)
      val pairs = (0 until nEdges).map { _ =>
        val a = rng.int(0, nVerts - 1).toLong; val b = rng.int(0, nVerts - 1).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).toDF("a", "b")
      val viaStars = Dedup.dupComponentsStars(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val viaHashMin = Dedup.dupComponents(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaStars == viaHashMin, s"trial $trial: $viaStars != $viaHashMin")
    }
  }
}
