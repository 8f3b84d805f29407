package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.index.Quadkey

/** Point-in-polygon join (SURVEY.md J6/F3), Spark-first.
  *
  * Strategy (designed for 10^12 points × O(10^2..10^4) polygons):
  *  1. The polygon side is tiny relative to the fact side → broadcast it once
  *     as a serializable [[BoundaryIndex]]; never shuffle the points.
  *  2. A coarse cell-id prefilter (pure-Column web-mercator tile arithmetic,
  *     stays in whole-stage codegen) skips the exact test for points whose
  *     tile doesn't touch any boundary bbox — at 100 TB this prunes the vast
  *     majority of rows *before* any JVM object is allocated.
  *  3. The exact ray-cast test runs per-partition against the one broadcast
  *     index (the reference's reused-index-objects pattern, north_rule).
  *
  * The plan is scan → codegen filter → mapPartitions probe: zero shuffles,
  * zero driver collection, linear scaling in partitions.
  */
object PipJoin {

  val PrefilterZoom = 6

  /** Inner PIP join: rows whose (lonCol, latCol) fall inside a boundary get
    * that boundary's id in `boundary_id`; rows outside all boundaries drop. */
  def join(points: DataFrame, boundaries: Seq[Boundary],
           lonCol: String, latCol: String): DataFrame = {
    val spark = points.sparkSession
    val bcIndex = spark.sparkContext.broadcast(new BoundaryIndex(boundaries.toArray))

    // coarse prefilter: set of z6 tiles intersecting any boundary bbox.
    // A degenerate bbox (minLon > maxLon — an antimeridian-crossing ring built
    // outside the Boundary constructor) would make the x-range EMPTY and the
    // prefilter would silently drop that boundary's points: skip the prefilter
    // instead (correctness first; the exact test still runs).
    val crossesAntimeridian = boundaries.exists(b => b.minLon > b.maxLon || b.minLat > b.maxLat)
    val tiles: Set[Long] =
      if (crossesAntimeridian) Set.empty
      else boundaries.flatMap { b =>
        val x0 = Quadkey.tileX(b.minLon, PrefilterZoom); val x1 = Quadkey.tileX(b.maxLon, PrefilterZoom)
        val y0 = Quadkey.tileY(b.maxLat, PrefilterZoom); val y1 = Quadkey.tileY(b.minLat, PrefilterZoom)
        for (x <- x0 to x1; y <- y0 to y1) yield Quadkey.cellId(x, y, PrefilterZoom)
      }.toSet

    val cellCol = Quadkey.cellIdCol(col(lonCol), col(latCol), PrefilterZoom)
    val prefiltered =
      if (!crossesAntimeridian && tiles.size <= 4096) points.filter(cellCol.isInCollection(tiles))
      else points // boundary set covers too much area for an IN-list; go straight to exact

    val pip = udf { (lon: Double, lat: Double) => bcIndex.value.queryFirst(lon, lat) }
    prefiltered
      .withColumn("boundary_id", pip(col(lonCol), col(latCol)))
      .filter(col("boundary_id").isNotNull)
  }

  /** PIP membership as a Column-only predicate for *convex-box* boundaries —
    * fully codegen, no UDF; used when every boundary is an axis-aligned box
    * (the changeset-bbox case, changesets/map-changeset-parser.js:18-24). */
  def boxJoinExpr(lon: Column, lat: Column, b: Boundary): Column =
    lon >= lit(b.minLon) && lon <= lit(b.maxLon) &&
      lat >= lit(b.minLat) && lat <= lit(b.maxLat)
}
