package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.SeedExprs
import graft.pipeline.ImagePipeline
import graft.plans.PipPrefilterRule
import graft.spatial.BoundaryIndex

class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PipPrefilterRule injects a coarse-tile IN prefilter and preserves results") {
    val index = new BoundaryIndex(ImagePipeline.metroBoundaries.toArray)
    def query = ImagePipeline.fastFeatures(spark, 3000, 4)
      .filter(SeedExprs.pipOrdinal(col("lon"), col("lat"), index) >= 0)

    val before = query.collect().map(_.getLong(0)).sorted.toSeq

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PipPrefilterRule
    try {
      val optimized = query
      val planStr = optimized.queryExecution.optimizedPlan.toString
      assert(planStr.contains("INSET") || planStr.contains(" IN "),
        s"prefilter missing from plan:\n$planStr")
      // fixpoint: exactly one prefilter injected even though the optimizer
      // re-runs batches (the rewritten PipOrdinal is marked)
      assert("pip_ordinal".r.findAllIn(planStr).size >= 1)
      val after = optimized.collect().map(_.getLong(0)).sorted.toSeq
      assert(after == before, "rule changed query results")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PipPrefilterRule)
    }
  }

  test("bucketed checkpoint layout: partition pruning reaches the scan (Iceberg-style)") {
    // the Iceberg-shaped story at 100 TB: the table is laid out by cell
    // bucket, so a bucket predicate must prune at PLANNING time (scan only
    // the matching directory), not as a post-scan filter over all bytes
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    try {
      val ms = graft.pipeline.Checkpoint.run(spark, 400, dir, buckets = 4, parts = 4)
      val wanted = ms.find(_.bucket == 2).get.rowCount
      val df = spark.read.parquet(s"$dir/data").filter(col("bucket") === 2)
      val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
      // the predicate must appear INSIDE the PartitionFilters bracket — the
      // metadata key itself prints even when empty ('PartitionFilters: []'),
      // so a bare contains() would pass exactly when pruning regressed
      assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(scan).isDefined,
        s"bucket predicate not inside PartitionFilters:\n$scan")
      // pruning must agree with the committed lineage row for row
      assert(df.count() == wanted)
      // and a non-partition predicate must still push down to parquet
      val df2 = spark.read.parquet(s"$dir/data").filter(col("fmt") === "png")
      val scan2 = df2.queryExecution.executedPlan.collectLeaves().mkString("\n")
      assert("PushedFilters: \\[[^\\]]*fmt".r.findFirstIn(scan2).isDefined,
        s"fmt predicate not inside PushedFilters:\n$scan2")
    } finally {
      graft.pipeline.Checkpoint.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("time-travel read: the as-of epoch predicate prunes at planning time (q119)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tt_prune").toString
    try {
      graft.pipeline.Checkpoint.runEpoch(spark, 0, 0L, 150L, dir, buckets = 4, parts = 4)
      graft.pipeline.Checkpoint.runEpoch(spark, 1, 150L, 260L, dir, buckets = 4, parts = 4)
      val df = spark.read.parquet(s"$dir/data").filter(col("epoch") <= 0)
      val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
      assert("PartitionFilters: \\[[^\\]]*epoch".r.findFirstIn(scan).isDefined,
        s"epoch predicate not inside PartitionFilters:\n$scan")
      assert(df.count() == 150L, "as-of read must see exactly the epoch-0 rows")
    } finally {
      graft.pipeline.Checkpoint.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}

class BucketedJoinSpec extends AnyFunSuite {
  import graft.ops.BucketedJoin
  lazy val spark = TestSpark.spark

  test("bucketed co-located join: zero exchanges below the join; plain reads shuffle; same relation") {
    val dir = "/root/testdata/sf0.001"
    BucketedJoin.layout(spark, dir, buckets = 4)
    def joined(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
      o.hint("merge").join(l, col("o_orderkey") === col("l_orderkey"))
    val bucketed = joined(spark.table("graft_orders_b"), spark.table("graft_lineitem_b"))
    val plain = joined(
      spark.read.parquet(s"$dir/orders.parquet"),
      spark.read.parquet(s"$dir/lineitem.parquet"))
    val nB = bucketed.count(); val nP = plain.count() // finalize AQE plans
    assert(nB == nP && nB > 0)
    val pB = bucketed.queryExecution.executedPlan.toString
    val pP = plain.queryExecution.executedPlan.toString
    assert(pB.contains("SortMergeJoin"), s"bucketed join not SMJ:\n${pB.take(600)}")
    assert(!pB.contains("Exchange"),
      s"bucketed join still exchanges — co-location broken:\n${pB.take(1200)}")
    assert(pP.contains("Exchange"),
      "plain join shows no exchange — the differential assertion is vacuous " +
        s"(broadcast crept in?):\n${pP.take(600)}")
    // the layout changes the plan, never the relation
    val rB = BucketedJoin.orderRevenueJoin(
      spark.table("graft_orders_b"), spark.table("graft_lineitem_b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rP = BucketedJoin.orderRevenueJoin(
      spark.read.parquet(s"$dir/orders.parquet"),
      spark.read.parquet(s"$dir/lineitem.parquet"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rB == rP)
  }
}
