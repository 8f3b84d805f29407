package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Two-parallelism scaling harness (north_rule): runs the identical flagship
  * job on the identical input at `local[N]` and `local[4N]` and reports
  * throughput at both plus scaling efficiency `T(4N)/(4·T(N))` ≥ 0.8.
  * Writes BENCH.md. `runMain graft.Scaling [nFeatures] [nImages] [N]`
  *
  * Two workloads are measured:
  *  - `pipeline`: feature derivation → H3/S2/quadkey encode → PIP join →
  *    per-tile per-team rollup (the spatial-join + tile-assignment metric of
  *    BASELINE.json, pixel-free path).
  *  - `synth+validate`: full image synthesis + decode + PSNR + caption check
  *    (the per-row pixel invariant) — CPU-heavy, embarrassingly parallel,
  *    the closest local analog of the cluster's per-executor work.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val nFeat = if (args.length > 0) args(0).toLong else 20000000L
    val nImg = if (args.length > 1) args(1).toLong else 400000L
    val baseN = if (args.length > 2) args(2).toInt else 8

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def runAt(cpus: Int): (Double, Double) = {
      val spark = Session.build(master = s"local[$cpus]", shufflePartitions = cpus,
        appName = s"graft-scaling-$cpus")
      spark.sparkContext.setLogLevel("WARN")
      import graft.pipeline.{ImagePipeline, Validate}
      // warm-up both plans (codegen + ICU init + C2 JIT excluded from
      // measurement — the image codecs only reach steady state after ~100k
      // rows, so the warm-up must be substantial or the slower parallelism
      // level gets an artificial JIT advantage)
      ImagePipeline.run(spark, 100000L, cpus).count()
      Validate.summary(ImagePipeline.synthTable(spark, 60000L, cpus * 4).toDF()).count()

      val tPipe = (1 to 3).map(_ => timed(ImagePipeline.run(spark, nFeat, cpus * 4).count())).min
      val tVal = (1 to 3).map(_ =>
        timed(Validate.summary(ImagePipeline.synthTable(spark, nImg, cpus * 4).toDF()).count())).min
      spark.stop()
      // allow the context to fully release before the next master spins up
      Thread.sleep(2000)
      (nFeat / tPipe, nImg / tVal)
    }

    val (pipeN, valN) = runAt(baseN)
    val (pipe4N, val4N) = runAt(baseN * 4)
    val effPipe = pipe4N / (4.0 * pipeN)
    val effVal = val4N / (4.0 * valN)

    val md =
      s"""# BENCH — two-parallelism scaling evidence (north_rule)
         |
         |Same job, same input, `local[$baseN]` vs `local[${baseN * 4}]` (N vs 4N cores,
         |single 32-core host; min of repeated runs after JVM/codegen warm-up).
         |
         || workload | rows | local[$baseN] rows/s | local[${baseN * 4}] rows/s | efficiency T(4N)/(4·T(N)) |
         ||---|---|---|---|---|
         || spatial-join + tile-assignment pipeline | $nFeat | ${pipeN.round} | ${pipe4N.round} | ${f"$effPipe%.3f"} |
         || image synth + decode + PSNR/caption validation | $nImg | ${valN.round} | ${val4N.round} | ${f"$effVal%.3f"} |
         |
         |Target: efficiency >= 0.8 (BASELINE.json). Reference sanity anchor:
         |the original engine sustained ~27.6k interactions/s on a whole
         |multi-core machine (BASELINE.md); this engine's per-core pipeline
         |throughput is ${(pipeN / baseN).round} rows/s/core.
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"), md)
    println(s"""{"pipeline_rps":{"n$baseN":${pipeN.round},"n${baseN * 4}":${pipe4N.round},"eff":$effPipe},""" +
      s""""validate_rps":{"n$baseN":${valN.round},"n${baseN * 4}":${val4N.round},"eff":$effVal}}""")
  }
}
