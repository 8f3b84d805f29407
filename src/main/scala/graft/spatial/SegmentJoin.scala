package graft.spatial

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Line-segment intersection join — the computational-geometry core of
  * "which ways cross" (road/boundary conflation, the reference's
  * intersecting-edit family lifted from shared-entity to shared-GEOMETRY).
  *
  * Exactness: endpoints live on an integer lattice, so the intersection
  * predicate is four orientation tests (2-D cross products, |coord| < 2^17
  * ⇒ |cross| < 2^36 — exact in BIGINT in both engines, no FP anywhere).
  * Only PROPER intersections count (strictly opposite orientations on both
  * sides); touching endpoints / collinear overlap are excluded by
  * definition, which keeps the predicate a pure sign test.
  *
  * Scale shape (PBSM — partition-based spatial merge): each segment is
  * exploded to the ≤ 2×2 grid cells its bbox covers (cell edge 1024 ≥ the
  * 512 max segment extent bounds the cover), candidates pair inside a cell
  * via ONE equi-join on the cell key, and a pair is emitted only in the
  * cell that contains the min-corner of the two bboxes' intersection — the
  * duplicate-avoidance rule that replaces q112's post-join `.distinct()`
  * (a second full shuffle) with a free per-row predicate. Candidate
  * completeness: a properly intersecting pair has overlapping bboxes; the
  * min-corner cell of that overlap is covered by BOTH segments, so the
  * equi-join sees the pair there — recall 1, proven against the honest
  * all-pairs oracle (prototyped vs an O(n²) brute force, /tmp/proto_w25).
  */
object SegmentJoin {

  /** Deterministic segment set from the events table: integer-lattice
    * endpoints in [512, 65023], extent ≤ 512 per axis — pure modular
    * arithmetic on event_id (no splitmix needed; replayed verbatim by the
    * DuckDB oracle). */
  def segments(spark: SparkSession, dir: String): DataFrame = {
    val id = col("event_id")
    table(spark, dir, "events").select(
      id.as("id"),
      (lit(1024L) + (id * 2654435761L) % 63488L).as("x1"),
      (lit(1024L) + (id * 2246822519L) % 63488L).as("y1"),
      (lit(1024L) + (id * 2654435761L) % 63488L + ((id * 3266489917L) % 1024L - 512L)).as("x2"),
      (lit(1024L) + (id * 2246822519L) % 63488L + ((id * 668265263L) % 1024L - 512L)).as("y2"))
  }

  private def cross(ox: Column, oy: Column, px: Column, py: Column,
                    qx: Column, qy: Column): Column =
    (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

  private def opposite(d1: Column, d2: Column): Column =
    (d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)

  /** Gate query (q153): per-grid-cell count of properly intersecting
    * segment pairs. */
  def intersectionCounts(spark: SparkSession, dir: String): DataFrame = {
    val withBox = segments(spark, dir)
      .withColumn("x0", least(col("x1"), col("x2")))
      .withColumn("xm", greatest(col("x1"), col("x2")))
      .withColumn("y0", least(col("y1"), col("y2")))
      .withColumn("ym", greatest(col("y1"), col("y2")))
    // bbox cover on the 1024-edge grid: at most 2 cells per axis
    val cells = withBox
      .withColumn("cx", explode(sequence(expr("x0 div 1024"), expr("xm div 1024"))))
      .withColumn("cy", explode(sequence(expr("y0 div 1024"), expr("ym div 1024"))))
    // hash-repartition both sides on the PBSM cell key at session
    // parallelism: the cell equi-join's own exchange carries only ~220k
    // narrow rows, so AQE's byte-based coalescing would run the whole
    // O(Σ per-cell pairs²) orientation-predicate join 2-wide; the explicit
    // partitioning is exactly the join's required distribution (no extra
    // exchange) and is the PBSM grid-to-workers assignment at any scale
    val nPar = spark.sparkContext.defaultParallelism
    val a = cells.select(cells.columns.map(c => col(c).as(s"a_$c")): _*)
      .repartition(nPar, col("a_cx"), col("a_cy"))
    val b = cells.select(cells.columns.map(c => col(c).as(s"b_$c")): _*)
      .repartition(nPar, col("b_cx"), col("b_cy"))
    val d1 = cross(col("b_x1"), col("b_y1"), col("b_x2"), col("b_y2"), col("a_x1"), col("a_y1"))
    val d2 = cross(col("b_x1"), col("b_y1"), col("b_x2"), col("b_y2"), col("a_x2"), col("a_y2"))
    val d3 = cross(col("a_x1"), col("a_y1"), col("a_x2"), col("a_y2"), col("b_x1"), col("b_y1"))
    val d4 = cross(col("a_x1"), col("a_y1"), col("a_x2"), col("a_y2"), col("b_x2"), col("b_y2"))
    a.join(b, col("a_cx") === col("b_cx") && col("a_cy") === col("b_cy") &&
        col("a_id") < col("b_id"))
      .where(opposite(d1, d2) && opposite(d3, d4) &&
        // min-corner duplicate avoidance: count the pair exactly once
        col("a_cx") === expr("greatest(a_x0, b_x0) div 1024") &&
        col("a_cy") === expr("greatest(a_y0, b_y0) div 1024"))
      .groupBy(col("a_cx").as("gx"), col("a_cy").as("gy"))
      .agg(count(lit(1)).as("n"))
  }
}
