package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Distribution-shift monitoring — the op a training pipeline runs between
  * data snapshots before trusting a refresh.
  */
object Drift {

  /** Gate query (q163) — total-variation drift: per event_type, the TV
    * distance between the value-bucket distributions of the first and
    * second half-month, kept EXACT: TV = Σ|c_a·n_b − c_b·n_a| over buckets,
    * scaled to e6 by div (2·n_a·n_b) — the common-denominator trick that
    * clears both normalizations without FP (PSI/KL need logs and would not
    * hash cross-engine; TV is the metric that stays rational).
    *
    * Scale shape: (type, bucket) counts aggregate map-side in one exchange;
    * the per-type totals are a tiny relation broadcast back; the fold is
    * over O(types·buckets) rows. */
  def tvDrift(spark: SparkSession, dir: String): DataFrame = {
    val bc = table(spark, dir, "events").select(
        col("event_type"),
        expr("floor(value * 100 + 0.5) div 5000").as("bucket"),
        when(col("ts") < lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L)
          .as("in_a"))
      .groupBy("event_type", "bucket")
      .agg(sum(col("in_a")).as("ca"), sum(lit(1L) - col("in_a")).as("cb"))
    val tot = bc.groupBy("event_type")
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    bc.join(broadcast(tot), Seq("event_type"))
      .groupBy("event_type")
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        count(lit(1)).as("n_buckets"),
        sum(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("l1_num"))
      .select(col("event_type"), col("na"), col("nb"), col("n_buckets"),
        expr("(l1_num * 1000000) div (2 * na * nb)").as("tv_e6"))
  }
}
