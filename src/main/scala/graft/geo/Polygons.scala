package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Vector polygon measures — the shoelace kernel (signed area, area-weighted
  * centroid, perimeter) every per-feature geometry rollup needs (the
  * reference's changeset-bbox areas and squaring metric are special cases of
  * exactly this family).
  *
  * Exactness contract: polygons are 8-direction integer star fans
  * (vertex_k = dir_k · r_k on the compass/diagonal directions, radii from
  * modular arithmetic on the feature id), so
  *  - 2·area and the 3·(2A)-scaled centroid numerators are EXACT BIGINTs
  *    (shoelace cross terms < 2^21), divisions are integer `div`;
  *  - the perimeter is the one FP column, and it hashes cross-engine
  *    because each sqrt argument is an exactly-representable integer, IEEE
  *    sqrt is correctly rounded in both engines, and BOTH sides add the 8
  *    edge lengths in the same left-associative order (the q86/q118 FP
  *    discipline: identical expression, identical evaluation order).
  *
  * Scale shape: the fan is UNROLLED into plain Column arithmetic — no
  * array, no explode, no UDF, no shuffle; one WholeStageCodegen projection
  * over the scan, embarrassingly parallel at any row count.
  */
object Polygons {

  private val Dirs = Array((1L, 0L), (1L, 1L), (0L, 1L), (-1L, 1L),
    (-1L, 0L), (-1L, -1L), (0L, -1L), (1L, -1L))

  /** Gate query (q154): per-feature 2·area, e6 centroid, e6 perimeter. */
  def polygonMeasures(spark: SparkSession, dir: String): DataFrame = {
    val id = col("event_id")
    def r(k: Int): Column = lit(100L) + (id * 2654435761L + lit(k * 40503L)) % 900L
    def x(k: Int): Column = lit(Dirs(k % 8)._1) * r(k % 8)
    def y(k: Int): Column = lit(Dirs(k % 8)._2) * r(k % 8)
    def cross(k: Int): Column = x(k) * y(k + 1) - x(k + 1) * y(k)
    val a2 = (0 until 8).map(cross).reduceLeft(_ + _)
    val cxn = (0 until 8).map(k => (x(k) + x(k + 1)) * cross(k)).reduceLeft(_ + _)
    val cyn = (0 until 8).map(k => (y(k) + y(k + 1)) * cross(k)).reduceLeft(_ + _)
    // IDENTICAL left-associative sum of correctly-rounded sqrts (see doc)
    val perim = (0 until 8).map { k =>
      val dx = x(k + 1) - x(k); val dy = y(k + 1) - y(k)
      sqrt((dx * dx + dy * dy).cast("double"))
    }.reduceLeft(_ + _)
    table(spark, dir, "events")
      .select(id.as("id"), a2.as("area2"),
        (cxn * 1000000L).as("cxn"), (cyn * 1000000L).as("cyn"),
        floor(perim * 1000000.0 + 0.5).cast("long").as("perim_e6"))
      .select(col("id"), col("area2"),
        expr("cxn div (area2 * 3)").as("cx_e6"),
        expr("cyn div (area2 * 3)").as("cy_e6"),
        col("perim_e6"))
  }
}
