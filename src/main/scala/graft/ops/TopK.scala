package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Session.table

/** Per-group top-k via bounded partial-aggregating heaps — the scale
  * alternative to the window `row_number() <= k` plan. The window form
  * shuffles EVERY row to its group's reducer and sorts there; the
  * aggregator form is a real partial+final aggregation, so each map task
  * forwards at most k rows per group it saw and the exchange carries
  * ≤ k·groups·partitions rows — at 100 TB with k=3 and a handful of
  * groups, that is bytes, not terabytes. The buffer keeps the k best
  * (value DESC, key ASC) pairs; merge concatenates and re-truncates, so
  * partial aggregation is associative/commutative by construction.
  * TopKSpec pins equality against Spark's own window plan and that the
  * executed plan contains partial_topk (objectagg) below the exchange
  * rather than a Window above it.
  */
object TopK {

  final case class TopKBuf(items: Seq[(Long, Long)]) // (value, key), value desc
  final case class SegTop(seg: String, items: Seq[(Long, Long)])

  private def ordered(items: Seq[(Long, Long)]): Seq[(Long, Long)] =
    items.sortBy { case (v, key) => (-v, key) }

  def topKAgg(k: Int): Aggregator[(Long, Long), TopKBuf, Seq[(Long, Long)]] =
    new Aggregator[(Long, Long), TopKBuf, Seq[(Long, Long)]] {
      def zero: TopKBuf = TopKBuf(Vector.empty)
      def reduce(b: TopKBuf, in: (Long, Long)): TopKBuf =
        TopKBuf(ordered(b.items :+ in).take(k))
      def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
        TopKBuf(ordered(a.items ++ b.items).take(k))
      def finish(b: TopKBuf): Seq[(Long, Long)] = ordered(b.items)
      def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      def outputEncoder: Encoder[Seq[(Long, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Gate query (q92): top-3 customers by account balance (cents; ties by
    * custkey) per market segment. Oracle: DuckDB row_number window. */
  def topCustomers(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long").as("bal_cents"),
        col("c_custkey"))
    implicit val inEnc: Encoder[(String, Long, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    val spark2 = spark; import spark2.implicits._
    cust.as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, bal, key) => (bal, key) }(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .agg(topKAgg(k).toColumn.name("top"))
      .flatMap { case (seg, top) =>
        top.zipWithIndex.map { case ((bal, key), i) => (seg, i + 1L, key, bal) }
      }
      .toDF("c_mktsegment", "rank", "c_custkey", "bal_cents")
  }

  /** The window-plan reference (shuffles every row): used by TopKSpec as the
    * in-Spark differential. */
  def topCustomersWindow(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy(col("bal_cents").desc, col("c_custkey"))
    table(spark, dir, "customer")
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long").as("bal_cents"),
        col("c_custkey"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("c_mktsegment", "rank", "c_custkey", "bal_cents")
  }
}
