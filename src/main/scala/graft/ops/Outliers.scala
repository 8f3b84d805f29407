package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Exact z-score outlier detection — |z| > 2.5 WITHOUT computing z: the
  * inequality (x−μ)²  > 6.25·σ² clears both divisions when written over the
  * population moments, 4·(n·x − S)² > 25·(n·SS − S²) — pure integer
  * arithmetic, so the outlier set hashes cross-engine (a float z would not).
  * The anomalous-contributor screen (which users behave unlike their
  * cohort) a data pipeline runs before trusting per-user aggregates.
  */
object Outliers {

  /** Gate query (q180): per (event_type, user) activity counts that sit
    * more than 2.5 population-σ from their type's mean. Magnitudes: x ≤
    * 10⁵, n ≤ 10⁷ ⇒ (n·x)² ≤ 10²⁴ — OVERFLOW in Long at extreme scale, so
    * the deviation is computed per-row and squared as (n·x − S) first
    * (|n·x − S| ≤ n·max_x ~ 10⁹ at sf1 ⇒ square ≤ 10¹⁸ — inside Long;
    * documented bound). */
  def zOutliers(spark: SparkSession, dir: String): DataFrame = {
    val x = table(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    val stats = x.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
    x.join(broadcast(stats), Seq("event_type"))
      .withColumn("dev", col("n") * col("x") - col("s"))
      .where(lit(4L) * col("dev") * col("dev") >
        lit(25L) * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("event_type"), col("user_id"), col("x"),
        when(col("dev") > 0, lit(1)).otherwise(lit(-1)).as("side"))
  }
}
