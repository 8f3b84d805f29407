package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * A warm-up pass at sf0.001 runs first (untimed): Spark 4's first
  * collation-aware string function pays a ~30-50 s one-time ICU static init
  * (CollationAwareUTF8String.<clinit>), and each plan's first execution pays
  * whole-stage-codegen compilation. Steady-state throughput is the metric
  * that scales to the cluster, so the JVM is warmed before timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = Session.build(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (ICU clinit, codegen, shuffle infra) — untimed. The explicit
    // lower()+string-compare forces CollationAwareUTF8String.<clinit> even if
    // a warm-up query fails before its first collation-aware comparison.
    import org.apache.spark.sql.functions.{lit, lower}
    spark.range(1).select(lower(lit("WarmUp")) === lit("warmup")).count()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    // headline metric (BASELINE.json): spatial-join + tile-assignment rows/s
    // on the image table — measured live on the codegen pipeline. Measured BEFORE the
    // query phase (98 query executions fragment the heap and depressed this
    // number ~2-3x when it ran last). Min-of-4 full-size reps (short jobs converge
    // over the first reps — measured 37→57→61M rows/s in a fresh JVM) gets
    // the steady state. The pinned two-parallelism evidence lives in BENCH.md
    // (tools/scaling.sh, 1.2B-row legs, pair-median protocol).
    System.gc()
    val nPipe = 200000000L
    val tPipe = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      graft.pipeline.ImagePipeline.run(spark, nPipe, cpus.toInt * 4).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    val pipeRps = (nPipe / tPipe).round

    // drain the pipeline phase's heap residue before the query phase: the 4
    // full-size 200M-row pipeline reps leave the old gen populated, and the
    // first alphabetical queries otherwise absorb the resulting GC pressure
    // (round-3 bench showed q02-q04 ~2x their fresh-JVM warm times; RunOne
    // reproduces 0.85-1.0 s vs the 1.7-2.6 s recorded in-bench)
    System.gc()

    // a failed query is recorded as -1.0 (never a normal-looking duration) and
    // named in `errors`, so the bench JSON distinguishes failure from slowness.
    // Min-of-2 timed reps per query: the sf0.001 warm-up does not warm
    // target-sf plan compilation/scan setup, and single-pass timing conflated
    // that first-execution cost with steady state (round-2 "regressions"
    // q28-q32 were all ~5-12 s setup over 1.5-2.4 s warm plans). Steady state
    // is what scales to the cluster, so rep 2 is the number that matters.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    // build-the-world gates (full synth→write→validate→commit checkpoint
    // builds) report in their own section: their cost is the build itself,
    // and mixing them into the query table made round-over-round per-query
    // comparison noisy (round-4 verdict, bench-hygiene item)
    // q81 writes both bucketed fact tables before joining — a layout build
    val buildNames = Set("q62_checkpoint_lineage", "q64_checkpoint_append",
      "q81_bucketed_join")
    val (builds, queries) = results.partition(r => buildNames(r._1))
    def jsonObj(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = queries.map(_._2).filter(_ >= 0).sum
    val buildsTotal = builds.map(_._2).filter(_ >= 0).sum

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonObj(queries)},"builds":${jsonObj(builds)},"builds_total":$buildsTotal,"errors":$errs,"sf":"$sfDir","cpus":$cpus,"pipeline_rows_per_sec":$pipeRps}""")
    spark.stop()
  }
}
