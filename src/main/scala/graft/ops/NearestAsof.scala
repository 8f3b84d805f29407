package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Session.table

/** Nearest as-of join — for each purchase, the view by the same user
  * CLOSEST in time on EITHER side (q82's backward as-of is the special
  * case; sensor fusion wants nearest). Ties (equal |Δt|) resolve to the
  * earlier side.
  *
  * Scale shape: the classic merged-stream trick — union both event kinds
  * into one per-user stream, then the backward candidate is a running
  * max-of-view-time over the ascending order and the forward candidate
  * the mirror over the descending order: two window passes on ONE
  * exchange keyed by user, no per-row range probe, no join at all.
  * Purchases with no view on either side are dropped (documented). */
object NearestAsof {

  def nearestJoin(spark: SparkSession, dir: String): DataFrame = {
    val merged = table(spark, dir, "events")
      .where(col("event_type").isin("purchase", "view"))
      .select(col("user_id"), col("event_id").as("eid"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        (col("event_type") === "view").as("is_view"))
    val asc = Window.partitionBy("user_id").orderBy(col("us"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("eid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("prev_v", max(when(col("is_view"), col("us"))).over(asc))
      .withColumn("next_v", min(when(col("is_view"), col("us"))).over(desc))
      .where(!col("is_view") && (col("prev_v").isNotNull || col("next_v").isNotNull))
      .select(col("user_id"), col("eid").as("purchase_eid"),
        when(col("prev_v").isNull, col("next_v"))
          .when(col("next_v").isNull, col("prev_v"))
          .when(col("us") - col("prev_v") <= col("next_v") - col("us"), col("prev_v"))
          .otherwise(col("next_v")).as("nearest_us"),
        col("us"))
      .select(col("user_id"), col("purchase_eid"),
        col("nearest_us"),
        abs(col("us") - col("nearest_us")).as("delta_us"),
        when(col("nearest_us") <= col("us"), lit(-1)).otherwise(lit(1)).as("dir"))
  }
}
