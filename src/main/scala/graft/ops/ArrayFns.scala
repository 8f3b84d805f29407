package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Higher-order array functions over embedding columns — the declarative
  * (codegen, no-UDF) tier for per-vector feature math: `filter`, `aggregate`
  * (left-to-right fold), `zip_with`, `reverse`, `array_position`/`array_max`
  * all run inside whole-stage codegen on the scan, so a 10^12-row embedding
  * table pays zero serialization for per-row vector features.
  *
  * FP discipline (the established kernel rule): floats are cast to DOUBLE[]
  * first and every sum is an explicit LEFT-TO-RIGHT fold — Spark's
  * `aggregate` and DuckDB's `list_reduce` both evaluate sequentially, so
  * the doubles are bit-identical cross-engine and the e6-floored outputs
  * hash exactly. No reliance on any engine's built-in sum order.
  */
object ArrayFns {

  /** Gate query (q105): per vector — positive-component count, first-argmax
    * index (1-based), e6-floored sum of squares, and e6-floored
    * dot(v, reverse(v)) (exercises zip_with + reverse). */
  def vectorStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings").select(
      col("vec_id"),
      expr("cast(size(filter(cast(embedding as array<double>), x -> x > 0d)) as bigint)")
        .as("n_pos"),
      expr("cast(array_position(cast(embedding as array<double>), array_max(cast(embedding as array<double>))) as bigint)")
        .as("max_idx"),
      floor(expr(
        "aggregate(cast(embedding as array<double>), 0d, (acc, x) -> acc + x * x)")
        * lit(1000000.0) + lit(0.5)).cast("long").as("ssq_e6"),
      floor(expr(
        """aggregate(zip_with(cast(embedding as array<double>),
          |reverse(cast(embedding as array<double>)), (x, y) -> x * y),
          |0d, (acc, x) -> acc + x)""".stripMargin)
        * lit(1000000.0) + lit(0.5)).cast("long").as("revdot_e6"))

  /** Gate query (q133): per-DIMENSION min–max feature scaling of the
    * embedding table — the normalization step a feature store runs before
    * training. posexplode → per-dimension (min, max) (a DIM-sized relation,
    * broadcast back) → every component rescaled to an e6 integer
    * (floor((v−mn)/(mx−mn)·10^6 + 0.5); the division is one double op both
    * engines compute identically), summed back per vector as an exact
    * integer checksum. The stats pass and the scale pass are each one
    * exchange; vectors never leave their partition unexploded. */
  def minMaxScale(spark: SparkSession, dir: String): DataFrame = {
    val v = table(spark, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(expr("cast(embedding as array<double>)")).as(Seq("d0", "v")))
      .select(col("vec_id"), (col("d0") + 1).as("d"), col("v"))
    val s = v.groupBy("d").agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    v.join(broadcast(s), "d")
      .select(col("vec_id"),
        when(col("mx") === col("mn"), 0L)
          .otherwise(floor((col("v") - col("mn")) / (col("mx") - col("mn"))
            * 1000000.0 + 0.5).cast("long")).as("e"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_dims"), sum(col("e")).as("sum_scaled_e6"))
  }
}
