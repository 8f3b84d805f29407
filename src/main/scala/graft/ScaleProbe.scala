package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling diagnostics: times each stage of the flagship pipeline separately
  * (derive-only, +PIP filter, full agg) so parallel-efficiency loss can be
  * attributed. Usage: runMain graft.ScaleProbe <cpus> <nFeat> [parts]. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nFeat = args(1).toLong
    val parts = if (args.length > 2) args(2).toInt else cpus * 4
    val spark: SparkSession = Session.build(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = s"graft-probe-$cpus")
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.ImagePipeline
    import graft.functions.SeedExprs
    import graft.spatial.BoundaryIndex

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm-up
    ImagePipeline.run(spark, 200000L, parts).count()

    val index = new BoundaryIndex(ImagePipeline.metroBoundaries.toArray)
    def derive = ImagePipeline.fastFeatures(spark, nFeat, parts)
      .select(sum(col("uid") + col("tile") + col("hex") + col("s2")))
    def pip = ImagePipeline.fastFeatures(spark, nFeat, parts)
      .withColumn("b_ord", SeedExprs.pipOrdinal(col("lon"), col("lat"), index))
      .filter(col("b_ord") >= 0).select(sum(col("uid") + col("tile")))
    def full = ImagePipeline.run(spark, nFeat, parts)

    // interleave stages so ambient noise is sampled evenly; print every rep
    val reps = 4
    val ds = new Array[Double](reps); val ps = new Array[Double](reps); val fs = new Array[Double](reps)
    for (r <- 0 until reps) {
      ds(r) = timed(derive.count()); ps(r) = timed(pip.count()); fs(r) = timed(full.count())
      System.err.println(f"[probe rep $r] derive ${ds(r)}%.2f s, pip ${ps(r)}%.2f s, full ${fs(r)}%.2f s")
    }
    println(s"""{"cpus":$cpus,"parts":$parts,"derive_rps":${(nFeat / ds.min).round},"pip_rps":${(nFeat / ps.min).round},"full_rps":${(nFeat / fs.min).round}}""")
    spark.stop()
  }
}
