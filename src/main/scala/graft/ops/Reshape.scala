package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Relational completeness: the outer-join null surface and the wide↔long
  * reshaping pair.
  *
  * q100 gates FULL OUTER join semantics row-for-row — both null sides are
  * genuinely exercised by the chosen thresholds (rich customers without big
  * orders AND big-order customers below the balance bar, verified at both
  * gate scales) — because outer-join null handling is exactly where a
  * from-scratch engine silently diverges (null keys, null payload columns,
  * coalesced key semantics).
  *
  * q101 gates pivot∘unpivot == identity: the wide matrix built by the
  * explicit-values pivot (data-independent schema — the q32/q38 discipline)
  * melts back via Spark's native unpivot to EXACTLY the plain groupBy
  * relation, which is the oracle. Pivot nulls (combinations that never
  * occurred) must disappear on the way back — the classic melt bug this
  * pins down.
  */
object Reshape {

  /** Gate query (q100): full outer join of high-balance customers against
    * big-order counts; both sides nullable, key coalesced. */
  def outerCoverage(spark: SparkSession, dir: String): DataFrame = {
    val rich = table(spark, dir, "customer")
      .filter(col("c_acctbal") > 7000.0)
      .select(col("c_custkey"), col("c_name"))
    val big = table(spark, dir, "orders")
      .filter(col("o_totalprice") > 280000.0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
    rich.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_big_orders"))
  }

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Gate query (q101): per-user event-type counts pivoted wide (explicit
    * values) then unpivoted back to long — must equal the direct groupBy
    * (the oracle); never-occurred combinations (null cells) drop. */
  def pivotRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val wide = table(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    wide.unpivot(Array(col("user_id")),
        EventTypes.map(col).toArray, "event_type", "n")
      .filter(col("n").isNotNull)
  }
}
