package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Multi-level aggregation in one pass — CUBE / ROLLUP / grouping sets.
  * The reference computes its rollup layers with separate jobs per level
  * (tile → team-tile → team-day in ImagePipeline); CUBE is the one-shuffle
  * alternative when ALL level combinations are wanted: Catalyst expands each
  * input row once per grouping set (Expand, ×4 here) and a single
  * partial+final hash aggregation produces every level, with `grouping_id()`
  * disambiguating which columns are aggregated away in each output row.
  *
  * At 100 TB the trade is explicit: Expand multiplies the MAP-side row count
  * by the number of grouping sets, but partial aggregation collapses each
  * set to its group cardinality before the exchange — so the shuffle carries
  * Σ|level| rows (the same as running the levels separately) while the scan
  * runs ONCE instead of once per level. MultiRollupSpec pins the plan:
  * exactly one Expand, one exchange, and partial aggregation below it.
  */
object MultiRollup {

  /** Gate query (q89): lineitem volume cube over (returnflag, linestatus) —
    * all four levels (both, each alone, grand total) in one job, integer
    * cent/quantity sums. `gid` bit i is 1 when grouping column i is
    * aggregated away (first listed column = most significant bit — the
    * SQL-standard GROUPING() convention DuckDB shares). */
  def volumeCube(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_items"),
        sum(floor(col("l_quantity") * lit(100.0) + lit(0.5)).cast("long"))
          .as("qty_cents"),
        sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("revenue_cents"))
}
