package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Session.table

/** Mergeable equi-width histogram quantiles — the integer-exact sketch tier
  * for percentiles at 100 TB. An exact quantile needs a global sort; the
  * histogram needs one hash aggregation: bin = value div W, per-bin counts
  * partial-merge (bin-wise sum — associative, merge-order-free), and the
  * quantile estimate is the lower edge of the first bin whose cumulative
  * count reaches ⌈q·N⌉ — within W of the exact value by construction
  * (HistQuantileSpec pins both the bound against Spark's exact sort-based
  * percentile and bin-wise-sum mergeability). Everything is 64-bit integer
  * arithmetic (cents, counts, basis points), so the DuckDB oracle replays
  * the ENTIRE sketch — bins, cumulative ranks, estimates — digit-for-digit.
  *
  * Scale shape: one partial+final agg over ≤ domain/W bins (~220 here);
  * the cumulative window runs on the BIN table (hundreds of rows, one
  * partition — deliberate: the data-sized exchange is the histogram agg,
  * never a sort of the input). Spark's own percentile_approx offers the
  * same trade with data-adaptive bins; this is the from-scratch form whose
  * answer is provable cross-engine.
  */
object HistQuantile {

  /** Gate query (q95): p50/p90/p99 of lineitem extendedprice (cents) from a
    * W = 50 000-cent histogram. Output: (q_bp, bin, est_cents). */
  def quantiles(spark: SparkSession, dir: String, widthCents: Long = 50000,
                qBps: Seq[Int] = Seq(5000, 9000, 9900)): DataFrame = {
    val cents = table(spark, dir, "lineitem")
      .select(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
        .as("cents"))
    val hist = cents.groupBy(expr(s"cents div $widthCents").as("bin"))
      .agg(count(lit(1)).as("n"))
    val cum = hist.withColumn("cum_n",
      sum(col("n")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cents.agg(count(lit(1)).as("total"))
    import spark.implicits._
    val q = qBps.map(_.toLong).toDF("q_bp")
    // first bin whose cumulative rank reaches ceil(q·N/10^4):
    // cum_n ≥ q_bp·N/10^4  ⇔  cum_n·10^4 ≥ q_bp·N (exact in 64-bit)
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(q))
      .filter(col("cum_n") * lit(10000L) >= col("q_bp") * col("total"))
      .groupBy(col("q_bp"))
      .agg(min(col("bin")).as("bin"))
      .withColumn("est_cents", col("bin") * lit(widthCents))
  }

  /** DuckDB replay of the identical sketch (shared by SparkEntry.oracleSql). */
  def oracle(widthCents: Long = 50000, qBps: Seq[Int] = Seq(5000, 9000, 9900)): String =
    s"""WITH c AS (SELECT floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS cents FROM lineitem),
       |h AS (SELECT cents // $widthCents AS bin, count(*)::BIGINT AS n FROM c GROUP BY 1),
       |cu AS (SELECT bin, sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_n FROM h),
       |t AS (SELECT count(*)::BIGINT AS total FROM c),
       |q AS (SELECT unnest([${qBps.mkString(", ")}])::BIGINT AS q_bp)
       |SELECT q_bp, min(bin)::BIGINT AS bin, (min(bin) * $widthCents)::BIGINT AS est_cents
       |FROM cu, t, q WHERE cum_n * 10000 >= q_bp * total GROUP BY 1""".stripMargin
}
