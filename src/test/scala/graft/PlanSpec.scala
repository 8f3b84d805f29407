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
}
