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
