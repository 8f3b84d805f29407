package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eager block management for `localCheckpoint()`-materialized frames.
  *
  * A localCheckpoint pins its RDD at MEMORY_AND_DISK until the ContextCleaner
  * notices the RDD object is unreachable — which needs a driver GC. Iterative
  * operators (dupComponents) and multi-consumer keysets (semiAnti) that are
  * invoked repeatedly in one JVM (bench reps, the gate runner) must therefore
  * free superseded checkpoints eagerly or the heap fills with dead blocks.
  */
object CacheOps {

  /** Run `body` with AQE disabled and `spark.sql.shuffle.partitions` pinned
    * to a width derived from the loop's OWN data size (guide §2: partition
    * counts follow input size, never a constant). Fixed-point loops
    * (components, PageRank, k-core, SSSP, pointer jumping) materialize one
    * tiny checkpoint per round; under AQE each exchange in that plan is its
    * own sub-job, so a 4-round loop pays ~25-45 job submissions of pure
    * scheduling (measured 20-50 ms each at sf0.1 while every stage ran 1-2
    * tasks). With AQE off each round is ONE job; the width pin keeps the
    * static planner from fanning tiny shuffles to the session default.
    * Restores both confs on exit (including the loud non-convergence throw).
    * The session's thread confs are mutated, so callers must not run
    * concurrent queries on the same session inside `body` — true of every
    * loop here (rounds are inherently sequential). */
  def withLoopConf[T](spark: org.apache.spark.sql.SparkSession, rows: Long)(body: => T): T =
    withLoopWidth(spark, math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, rows / 65536L)).toInt)(body)

  /** Materialized byte size of a localCheckpoint'd frame — a pure
    * driver-side storage-info lookup (no job; 0 for non-checkpoints or
    * not-yet-materialized ones). */
  def checkpointBytes(spark: org.apache.spark.sql.SparkSession, df: DataFrame): Long =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        spark.sparkContext.getRDDStorageInfo.find(_.id == lr.rdd.id)
          .map(i => i.memSize + i.diskSize).getOrElse(0L)
      case _ => 0L
    }

  /** Loop width for a MATERIALIZED localCheckpoint, derived from its
    * registered block bytes (~1 MB per partition, capped at session
    * parallelism) — so operators whose specs pin "zero count actions"
    * (CacheSpec on dupComponents) can size their loops without a job. */
  def checkpointWidth(spark: org.apache.spark.sql.SparkSession, df: DataFrame): Int =
    math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      checkpointBytes(spark, df) / (1L << 20))).toInt

  /** Size-GATED broadcast hint for plans built over localCheckpoints.
    * A checkpoint's LogicalRDD carries no statistics, so the planner
    * shuffle-joins relations that parquet statistics would have broadcast;
    * a blanket `broadcast()` hint would fix that locally but FORCE an
    * unbounded broadcast at production scale. This gates the hint on the
    * MEASURED materialized size of `basis` (the checkpoint the relation
    * derives from): under `maxBasisBytes` (default 64 MB — guide §3.1's
    * "a few hundred MB is usually fine" with margin for derived-relation
    * expansion) the broadcast the stats-driven plan chose is restored;
    * above it the shuffle-join fallback stands. Scale-adaptive by
    * construction, like autoBroadcastJoinThreshold but fed by real bytes. */
  def broadcastIfSmall(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
                       basis: DataFrame, maxBasisBytes: Long = 64L << 20): DataFrame =
    if (checkpointBytes(spark, basis) <= maxBasisBytes)
      org.apache.spark.sql.functions.broadcast(df)
    else df

  def withLoopWidth[T](spark: org.apache.spark.sql.SparkSession, width: Int)(body: => T): T = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    val sp = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", width.toString)
    try body finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.shuffle.partitions", sp)
    }
  }

  /** Drop a localCheckpoint'd DataFrame's cached blocks NOW.
    *
    * Returns true iff blocks were actually freed. A localCheckpoint'd frame
    * analyzes to a bare [[LogicalRDD]]; if a Spark upgrade ever wraps that
    * plan, this match would stop engaging — so rather than silently no-op
    * (the eager-free guarantee dying invisibly), the miss is logged and
    * surfaced to callers, and CacheSpec asserts on the return value. */
  def freeLocalCheckpoint(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(false); true
      case other =>
        Console.err.println(
          s"[graft] freeLocalCheckpoint: expected LogicalRDD, got ${other.getClass.getSimpleName} — blocks NOT freed")
        false
    }
}
