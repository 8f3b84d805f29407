package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Session.table

/** Distributed AS-OF join — for each left row, the single latest right row
  * with the same key and timestamp ≤ the left timestamp. The classic
  * time-series operator Spark has no built-in for; the naive formulation is
  * a non-equi join (`l.key = r.key AND r.ts <= l.ts` + argmax), which
  * Catalyst can only run as a nested-loop or an exploding theta-join.
  *
  * Implementation is the union-tag pattern, the shape that scales: tag right
  * rows side=0 and left rows side=1, union, then ONE window
  * `partitionBy(key).orderBy(ts, side)` with `last(value, ignoreNulls)` over
  * UNBOUNDED PRECEDING..CURRENT ROW carries the most recent right attributes
  * forward onto every left row. One shuffle on the key, zero join explosion,
  * per-key cost linear in that key's row count — at 10^12 rows this is a
  * sort-based single pass per key, exactly what a hand-written merge as-of
  * would do, except Catalyst plans it and AQE handles the partitioning.
  *
  * Semantics pinned by the (ts, side) sort: at equal timestamps the right
  * copy (side 0) precedes the left copy, so `ts >= r.ts` is INCLUSIVE —
  * matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which is the oracle
  * (a completely different algorithm family: DuckDB plans a specialized
  * partitioned sort-merge). Determinism needs a total order per key:
  * (user_id, ts) is unique in the events table (asserted in AsofSpec), and
  * `side` splits the two copies of each right row.
  */
object AsofJoin {

  /** Generic as-of: carry `valueCols` of the latest `right` row (same `key`,
    * `rightTs <= leftTs`) onto each `left` row; inner semantics (left rows
    * with no prior right row are dropped). */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           valueCols: Seq[String]): DataFrame = {
    val carried = valueCols.map(c => s"m_$c")
    val leftPayload = left.columns.filterNot(c => c == key || c == leftTs).toSeq
    val rCols: Seq[org.apache.spark.sql.Column] =
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"m_$c"))
    val lCols: Seq[org.apache.spark.sql.Column] =
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"m_$c"))
    val r = right.select(rCols: _*)
    val l = left.select(lCols: _*)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = carried.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    withCarry
      .filter(col("__side") === 1 && col(carried.head).isNotNull)
      .withColumnRenamed("__ts", leftTs)
      .drop("__side")
  }

  /** Gate query (q82): every event joined as-of to the same user's most
    * recent purchase event (inclusive — a purchase matches itself, gap 0).
    * Output: the purchase id, the gap in exact integer microseconds, and the
    * purchase value in cents. */
  def lastPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), unix_micros(col("ts").cast("timestamp")).as("p_ts_us"),
        col("value").as("p_value"))
    asof(ev.select("user_id", "ts", "event_id", "event_type"), purchases,
      key = "user_id", leftTs = "ts", rightTs = "ts",
      valueCols = Seq("p_event_id", "p_ts_us", "p_value"))
      .select(col("event_id"), col("event_type"),
        col("m_p_event_id").as("p_event_id"),
        (unix_micros(col("ts").cast("timestamp")) - col("m_p_ts_us")).as("gap_us"),
        floor(col("m_p_value") * lit(100.0) + lit(0.5)).cast("long")
          .as("p_value_cents"))
  }
}
