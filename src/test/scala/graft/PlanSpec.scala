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
}
