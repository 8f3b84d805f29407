package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Session.table

/** Time-series resampling — densify each user's event stream to a continuous
  * daily grid (sequence + explode over the user's own [min, max] span, so no
  * global calendar table is materialized) and forward-fill the last observed
  * daily value across gap days (`last(_, ignoreNulls)` over the running
  * frame). The gap-filling shape every downstream daily model needs, done
  * without a driver loop or a calendar crossJoin.
  *
  * Scale shape (measured, local[32]): the daily rollup shuffles on
  * (user, day), the span rollup on user; the grid join then BROADCASTS the
  * dimension-bounded daily table (AQE picks it at gate scale) and the
  * forward-fill window reuses the grid side's user partitioning — no
  * exchange between join and window. Grid size is Σ per-user spans, never
  * users × global-calendar. At 10^9 users the daily table stops being
  * broadcastable and the join co-partitions on (user, day) instead — the
  * same plan minus the broadcast, still three exchanges.
  */
object Resample {

  /** Gate query (q102): per (user, day) over each user's full span — event
    * count (0 on gap days) and the forward-filled daily value sum in cents.
    */
  def dailyFfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"),
        floor(floor(unix_timestamp(col("ts"))) / lit(86400)).cast("long").as("day"),
        col("value"))
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("day_cents"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_cents"), ignoreNulls = true).over(w).as("carried_cents"))
  }
}
