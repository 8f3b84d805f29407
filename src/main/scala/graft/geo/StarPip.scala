package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Exact integer point-in-polygon join against the q154 star-polygon
  * family — the all-integer sibling of the FP ray-cast PIP (q17/q50):
  * locate the point's angular wedge (two sign tests against the fixed
  * compass directions), then one orientation test against that wedge's
  * edge. Every comparison is an integer cross product, so the containment
  * RELATION is exact — no epsilon, no on-edge ambiguity drift
  * (boundary convention: wedge rays belong to the CCW-next wedge via the
  * ≥/> asymmetry; points ON a polygon edge are outside — strict test).
  * Prototype-verified against an independent integer ray-cast
  * (crossing-number, half-open rule): 40,000/40,000 agree.
  *
  * Scale shape: polygons are the broadcast dim (one per sparse order
  * key), points the fact; the join is broadcast-nested-loop with a
  * codegen'd 8-wedge predicate — the honest plan when the dim is small
  * and the predicate is not an equi-key. The per-pair cost is ~20 integer
  * ops with zero allocation.
  */
object StarPip {

  private val Dirs = Array((1L, 0L), (1L, 1L), (0L, 1L), (-1L, 1L),
    (-1L, 0L), (-1L, -1L), (0L, -1L), (1L, -1L))

  /** Gate query (q181): per-polygon count of contained points (polygons
    * from sparse order keys, points from event ids).
    *
    * Per-pair cost engineering (guide §3): each point's wedge index is
    * resolved ONCE on the point side, and the orientation test against
    * wedge k's edge (r1·d_k → r2·d_{k+1}) is expanded algebraically —
    * (x2−x1)(py−y1) − (y2−y1)(px−x1) with x1=d1x·r1 … expands to
    * u·r1 + v·r2 + r1·r2·cross(d1,d2) where u = d1y·px − d1x·py,
    * v = d2x·py − d2y·px, and cross(d1,d2) = 1 for every adjacent compass
    * pair — an IDENTICAL integer predicate (|u|,|v| ≤ 2000, r ≤ 999: no
    * overflow) costing 2 mul + 2 add per pair. (u, v) depend only on the
    * point, (r1, r2, r1·r2) only on the polygon wedge, so the former
    * broadcast-nested-loop over 8 wedge branches becomes a broadcast HASH
    * join on the wedge index against the 8-way exploded polygon dim.
    * The point side is round-robin repartitioned to the session
    * parallelism first: the fact scan is otherwise a single input split
    * (one file) and the whole O(|points|·|polys|) probe ran on ONE core
    * (measured 5.0 s task time ≈ 5.2 s stage wall at sf0.1).
    * First version re-derived all 16 vertex coords per pair: 174 s. */
  def containJoin(spark: SparkSession, dir: String): DataFrame = {
    val pid = col("pid"); val px = col("px"); val py = col("py")
    def r(k: Int): Column = lit(100L) + (pid * 2654435761L + lit((k % 8) * 40503L)) % 900L
    // one row per (polygon, wedge): the wedge's two radii and their product
    // (explicit select levels — withColumn over a fresh generator alias
    // trips Spark 4's lateral-column-alias internal check)
    val polys = table(spark, dir, "orders")
      .where(col("o_orderkey") % 331 === 0)
      .select(col("o_orderkey").as("pid"))
      .select(col("pid"),
        posexplode(array((0 until 8).map(k => r(k)): _*)).as(Seq("k", "r1")))
      .select(col("pid"), col("k"), col("r1"),
        (lit(100L) + (pid * 2654435761L + (col("k") + 1) % 8 * 40503L) % 900L).as("r2"))
      .select(col("pid"), col("k"), col("r1"), col("r2"),
        (col("r1") * col("r2")).as("rr"))
    // wedge index resolved once per point: first k with
    // cross(d_k, p) >= 0 && cross(p, d_{k+1}) > 0
    val wedge = (0 until 8).foldRight(lit(-1): Column) { (k, acc) =>
      val (d1x, d1y) = Dirs(k); val (d2x, d2y) = Dirs((k + 1) % 8)
      when((lit(d1x) * py - lit(d1y) * px >= 0) &&
        (px * lit(d2y) - py * lit(d2x) > 0), lit(k)).otherwise(acc)
    }
    def wedgeCase(f: ((Long, Long), (Long, Long)) => Column): Column =
      (0 until 8).foldRight(lit(0L): Column) { (k, acc) =>
        when(col("wk") === k, f(Dirs(k), Dirs((k + 1) % 8))).otherwise(acc)
      }
    val points = table(spark, dir, "events").select(
        col("event_id").as("eid"),
        ((col("event_id") * 2654435761L) % 2001L - 1000L).as("px"),
        ((col("event_id") * 2246822519L) % 2001L - 1000L).as("py"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("eid"), col("px"), col("py"), wedge.as("wk"))
      .select(col("eid"), col("wk"),
        wedgeCase { case ((d1x, d1y), _) => lit(d1y) * px - lit(d1x) * py }.as("u"),
        wedgeCase { case (_, (d2x, d2y)) => lit(d2x) * py - lit(d2y) * px }.as("v"))
    // the join keys/condition are wrapped null-safely (wk/u/v are total
    // expressions, never null): otherwise InferFiltersFromConstraints adds
    // isnotnull(u)/isnotnull(v) filters that push below the repartition
    // exchange and substitute into one giant nested-CASE predicate evaluated
    // per event row on the single-split scan task (measured: a 1.75 s
    // single-task stage doing nothing but that redundant null check)
    points.join(broadcast(polys),
        coalesce(col("wk"), lit(-1)) === col("k") &&
        coalesce(col("u") * col("r1") + col("v") * col("r2") + col("rr"), lit(0L)) > 0)
      .groupBy("pid").agg(count(lit(1)).as("n_inside"))
  }
}
