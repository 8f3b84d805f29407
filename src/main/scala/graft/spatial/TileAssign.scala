package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.index.{Hex, Quadkey, S2Like}

/** Feature→tile assignment — the tiling-engine core (SURVEY.md J7/X10;
  * reference: tile-reduce bucketing by z12 quadkey,
  * util/map-contribution-extractor.js:85,186,191).
  *
  * All encoders come in two shapes:
  *  - pure-Column arithmetic (tileX/tileY/cellId) → whole-stage codegen;
  *  - `mapPartitions`-friendly batch functions over reused index objects for
  *    the encoders that genuinely need loops (quadkey string, hex, s2).
  */
object TileAssign {

  /** Attach slippy-tile coords + packed cell id at zoom z (codegen path). */
  def withTile(df: DataFrame, lonCol: String, latCol: String, z: Int): DataFrame =
    df.withColumn("tile_x", Quadkey.tileXCol(col(lonCol), z))
      .withColumn("tile_y", Quadkey.tileYCol(col(latCol), z))
      .withColumn("cell_id", Quadkey.cellIdCol(col(lonCol), col(latCol), z))

  /** Quadkey string column (needs a digit loop → UDF; off the hot path). */
  def quadkeyCol(lon: Column, lat: Column, z: Int): Column = {
    val f = udf { (lo: Double, la: Double) =>
      Quadkey.toQuadkey(Quadkey.tileX(lo, z), Quadkey.tileY(la, z), z)
    }
    f(lon, lat)
  }

  /** Hex cell id column (H3-style, res 0-14). */
  def hexCellCol(lon: Column, lat: Column, res: Int): Column = {
    val f = udf { (lo: Double, la: Double) => Hex.latLngToCell(la, lo, res) }
    f(lon, lat)
  }

  /** S2-style cell id column at a level. */
  def s2CellCol(lon: Column, lat: Column, level: Int): Column = {
    val f = udf { (lo: Double, la: Double) => S2Like.cellIdAt(la, lo, level) }
    f(lon, lat)
  }

  /** Salted repartition on cell prefix — the skew treatment (north_rule):
    * dense metro cells are split across `salt` buckets so no single task owns
    * a hotspot; AQE skew-join splitting handles the residual. */
  def repartitionByCellSalted(df: DataFrame, cellCol: String, numPartitions: Int, salt: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(cellCol), monotonically_increasing_id()), lit(salt)))
      .repartition(numPartitions, col(cellCol), col("__salt"))
      .drop("__salt")

  /** Multi-zoom emission — the reference's objects layer spans z12-16 and
    * the summary layers z1-12 (util/README.md:13-18): each feature is
    * assigned its cell at every requested zoom in one pass (explode of the
    * parent chain; parents are bit-shifts of the z-max cell, no re-encode). */
  def withTileMultiZoom(df: DataFrame, lonCol: String, latCol: String,
                        zooms: Seq[Int]): DataFrame = {
    val zMax = zooms.max
    val base = df.withColumn("__cell_zmax",
      Quadkey.cellIdCol(col(lonCol), col(latCol), zMax))
    // parent at z: drop (zMax-z) low bits of x and y
    val cells = zooms.map { z =>
      val shift = zMax - z
      struct(lit(z).as("zoom"),
        ((lit(z.toLong) * lit(1L << 58)) +
          shiftleft(shiftright(col("__cell_zmax").bitwiseAND(lit((1L << 58) - 1)), 29 + shift), 29) +
          shiftright(col("__cell_zmax").bitwiseAND(lit((1L << 29) - 1)), shift)).as("cell"))
    }
    base.withColumn("__zc", explode(array(cells: _*)))
      .withColumn("zoom", col("__zc.zoom"))
      .withColumn("cell_id", col("__zc.cell"))
      .drop("__zc", "__cell_zmax")
  }

  /** Per-tile rollup over an integer grid (gate-friendly exact variant):
    * tiles are an n×n equirectangular grid; emits per-tile counts +
    * per-class conditional sums — the reference's tilePointSummaries shape
    * (map-contribution-extractor.js:279-320). */
  def gridRollup(points: DataFrame, lonCol: String, latCol: String, n: Int,
                 classCol: String, classes: Seq[String]): DataFrame = {
    val tx = least(lit(n - 1), greatest(lit(0),
      floor((col(lonCol) + 180.0) / 360.0 * n).cast("int"))).as("tx")
    val ty = least(lit(n - 1), greatest(lit(0),
      floor((lit(90.0) - col(latCol)) / 180.0 * n).cast("int"))).as("ty")
    val aggs = classes.map(c =>
      sum(when(col(classCol) === c, 1L).otherwise(0L)).as(s"n_$c")) :+
      count(lit(1)).as("n_total")
    points.groupBy(tx, ty).agg(aggs.head, aggs.tail: _*)
  }
}
