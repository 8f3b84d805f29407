package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spatial.SpatialQueries

/** Geohash — the third index family next to quadkey and the hex/S2 tiers:
  * base32 text cells whose PREFIX relation is the containment relation, so
  * a LIKE 'u09%' predicate, a string range scan, and a prefix groupBy are
  * all cell operations (the property quadkeys get from digit prefixes,
  * carried into a human-readable key that sorts lexicographically =
  * spatially). A precision-p hash is 5p bits: lon takes ⌈5p/2⌉ (it gets
  * the even/MSB-first positions), lat ⌊5p/2⌋ — i.e. a Morton code with
  * lon first, emitted in the classic 0-9b-z alphabet.
  *
  * Everything is literal-shift Column algebra (codegen, ANSI-safe: the
  * code is < 2^30 at p=6) + element_at char lookup — no UDF. The DuckDB
  * oracle rebuilds the same bits with `>> & *` and substr() indexing into
  * the alphabet, so the gate pins the full encode bit-for-bit.
  */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Scaled integer coordinate: floor((v+half)/span · 2^bits), clamped to
    * the top cell (v = +max edge). */
  private def scaled(v: Column, half: Double, bits: Int): Column =
    least(floor((v + lit(half)) / lit(2 * half) * lit((1L << bits).toDouble)),
      lit((1L << bits) - 1.0)).cast("long")

  /** The 5p-bit geohash integer code (lon bit 14 at code bit 29, lat bit 14
    * at code bit 28, ... — lon-first interleave, MSB down). */
  def codeCol(lon: Column, lat: Column, precision: Int): Column = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    val ix = scaled(lon, 180.0, lonBits)
    val iy = scaled(lat, 90.0, latBits)
    // MSB-first alternation starting with lon ⇒ counting from the LSB:
    // even totalBits → lon bit i at code position 2i+1, lat bit i at 2i;
    // odd totalBits → lon at 2i, lat at 2i+1.
    val lonShift = if (totalBits % 2 == 0) 1 else 0
    val lons = (0 until lonBits).map { i =>
      shiftright(ix, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + lonShift))
    }
    val lats = (0 until latBits).map { i =>
      shiftright(iy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1 - lonShift))
    }
    (lons ++ lats).reduce(_ + _)
  }

  /** Geohash string of `precision` base32 chars from the code. */
  def geohashCol(lon: Column, lat: Column, precision: Int): Column = {
    val code = codeCol(lon, lat, precision)
    val chars = typedLit(Alphabet.toCharArray.map(_.toString))
    concat((0 until precision).map { j =>
      element_at(chars,
        shiftright(code, 5 * (precision - 1 - j)).bitwiseAND(lit(31L)).cast("int")
          + lit(1))
    }: _*)
  }

  /** Gate query (q94): precision-6 geohash of every event point, rolled up
    * by 4-char prefix (≈ 20 km cells) — count + distinct users per cell;
    * the prefix rollup IS the containment rollup. */
  def prefixRollup(spark: SparkSession, dir: String, precision: Int = 6): DataFrame =
    SpatialQueries.eventPoints(spark, dir)
      .select(col("user_id"), geohashCol(col("lon"), col("lat"), precision).as("gh"))
      .groupBy(substring(col("gh"), 1, 4).as("gh4"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
}
