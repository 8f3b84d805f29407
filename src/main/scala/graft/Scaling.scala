package graft

import org.apache.spark.sql.SparkSession

/** One leg of the two-parallelism scaling evidence (north_rule). Run via
  * `tools/scaling.sh`, which pins the JVM to N / 4N CPUs with `taskset` —
  * local[N] on an unrestricted 32-core host is NOT an N-core cluster (GC and
  * JIT threads spill onto the idle cores and inflate the small-N baseline;
  * measured: local[8] unpinned looks 1.7x faster than pinned).
  *
  * Prints ONE JSON line: {"cpus":N,"pipeline_rps":...,"validate_rps":...}.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 8
    val nFeat = if (args.length > 1) args(1).toLong else 10000000L
    val nImg = if (args.length > 2) args(2).toLong else 400000L

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val spark: SparkSession = Session.build(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = s"graft-scaling-$cpus")
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{ImagePipeline, Validate}

    // warm-up: ICU init, codegen, C2 JIT of the image codecs (the codecs only
    // reach steady state after ~100k rows)
    ImagePipeline.run(spark, 200000L, cpus * 4).count()
    Validate.summary(ImagePipeline.synthTable(spark, 60000L, cpus * 4).toDF()).count()

    val tPipe = (1 to 3).map(_ => timed(ImagePipeline.run(spark, nFeat, cpus * 4).count())).min
    val tVal = (1 to 3).map(_ =>
      timed(Validate.summary(ImagePipeline.synthTable(spark, nImg, cpus * 4).toDF()).count())).min
    println(s"""{"cpus":$cpus,"pipeline_rps":${(nFeat / tPipe).round},"validate_rps":${(nImg / tVal).round}}""")
    spark.stop()
  }
}
