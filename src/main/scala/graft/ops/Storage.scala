package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Session.table
import graft.functions.SeedExprs

/** Storage-layer operators for the 100 TB lakehouse: what to ENCODE, what to
  * SKIP, and how to tell two table states apart without reading either —
  * the maintenance trio next to q119-q123's time-travel/compaction/CDC.
  */
object Storage {

  /** Gate query (q155) — encoding advisor: per-column run/cardinality stats
    * that drive the parquet encoding choice (RLE vs dictionary vs plain).
    * Runs are counted WITHIN l_orderkey groups in l_linenumber order — the
    * row-group-local definition that matches how a writer actually encodes
    * (and the one that distributes: the window partitions by the group key,
    * never a global sort). One pass: unpivot 4 columns map-side via stack,
    * one window shuffle on (col_name, l_orderkey), one hash agg. */
  def encodingAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val long = table(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey").as("pk"),
      col("l_suppkey").as("sk"),
      expr("""stack(4,
        'l_returnflag', l_returnflag,
        'l_linestatus', l_linestatus,
        'l_suppkey', cast(l_suppkey as string),
        'l_partkey', cast(l_partkey as string)) as (col_name, val)"""))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
    // (the Verify gotcha) — tiebreak down to val so the scan order, and
    // with it the run count, is total
    val w = Window.partitionBy("col_name", "l_orderkey")
      .orderBy("l_linenumber", "pk", "sk", "val")
    long.withColumn("prev", lag("val", 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("prev") =!= col("val"), 1L).otherwise(0L))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("val")).as("n_distinct"),
        sum(col("brk")).as("n_runs"))
      .select(col("col_name"), col("n_rows"), col("n_distinct"), col("n_runs"),
        expr("(n_rows * 1000000) div n_runs").as("avg_run_e6"),
        when(col("n_runs") * 4 <= col("n_rows"), "RLE")
          .when(col("n_distinct") * 20 <= col("n_rows"), "DICT")
          .otherwise("PLAIN").as("rec"))
  }

  private val Preds = Seq(
    (1L, "2000-01-01", "2000-06-30"),
    (2L, "2001-01-01", "2001-12-31"),
    (3L, "1990-01-01", "1990-12-31"),
    (4L, "2000-03-15", "2000-03-15"))

  /** Gate query (q156) — zone-map skipping simulator: files are l_orderkey
    * ranges (div 256 — the natural-ingest clustering), per-file min/max
    * l_shipdate zone maps, and for each candidate predicate the files
    * skipped vs rows that must still be scanned. THE data-skipping
    * effectiveness report that decides whether a 100 TB table needs
    * re-clustering on ship_date before the scan bill arrives. One groupBy
    * builds the (tiny) zone-map relation; predicates broadcast over it. */
  def zoneMapSim(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
      .cast("long")
    val zones = table(spark, dir, "lineitem")
      .select(expr("l_orderkey div 256").as("fid"), day.as("day"))
      .groupBy("fid")
      .agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"),
        count(lit(1)).as("n"))
    import spark.implicits._
    val preds = Preds.toDF("pid", "lo_s", "hi_s").select(col("pid"),
      datediff(col("lo_s").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("lo"),
      datediff(col("hi_s").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("hi"))
    zones.crossJoin(broadcast(preds))
      .withColumn("skip", col("dmax") < col("lo") || col("dmin") > col("hi"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("skip"), 1L).otherwise(0L)).as("n_skipped"),
        sum(when(col("skip"), 0L).otherwise(col("n"))).as("rows_scanned"))
  }

  /** SQL text for q156's predicate relation (shared with the oracle so the
    * ranges cannot drift). */
  def predsSql: String = Preds.map { case (p, lo, hi) =>
    s"($p, DATE '$lo', DATE '$hi')"
  }.mkString("(VALUES ", ", ", ") preds(pid, lo_d, hi_d)")

  /** Gate query (q157) — Merkle-style range-digest diff: per-l_orderkey-
    * bucket order-free digests (bit_xor of a splitmix of (key, cents)) of
    * the orders table vs a deterministically perturbed replica, emitting
    * only the buckets whose digest or count differs. THE anti-entropy
    * primitive for 100 TB replication: each side computes B digest rows
    * locally (one scan, one tiny agg), ships O(B) bytes, and only differing
    * ranges are re-read. bit_xor is the aggregate because it is order- and
    * partition-free (no overflow semantics to align cross-engine). */
  def merkleDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders").select(
      col("o_orderkey").as("k"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    def digest(df: DataFrame): DataFrame =
      df.select(expr("k div 64").as("bucket"),
          SeedExprs.mix64(SeedExprs.mix64(col("k")).bitwiseXOR(col("cents"))).as("h"))
        .groupBy("bucket")
        .agg(expr("bit_xor(h)").as("digest"), count(lit(1)).as("n"))
    val src = digest(o)
    val dst = digest(o.withColumn("cents",
      col("cents") + when(col("k") % 97 === 0, 1L).otherwise(0L)))
    src.join(dst.select(col("bucket"), col("digest").as("dst_digest"),
        col("n").as("dst_n")), Seq("bucket"))
      .where(col("digest") =!= col("dst_digest") || col("n") =!= col("dst_n"))
      .select(col("bucket"), col("n"), col("digest").as("src_digest"),
        col("dst_digest"))
  }
}
