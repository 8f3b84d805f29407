package graft.geo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** GeoJSON feature writing (reference: the geojsonseq sink,
  * InteractionsBuilder.java:427-439 + GeoJsonWriter(18) at :88 — one feature
  * per line, no CRS). Properties are emitted key-sorted so output is
  * byte-deterministic (the reference's HashMap key order was not — SURVEY.md
  * §7.4 #2 — which is exactly why goldens there had to be normalized).
  */
object GeoJson {

  /** Doubles rendered like Java's shortest-roundtrip toString. */
  @inline private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def pointGeometry(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[${num(lon)},${num(lat)}]}"""

  def polygonGeometry(lons: Array[Double], lats: Array[Double]): String = {
    val ring = lons.indices.map(i => s"[${num(lons(i))},${num(lats(i))}]").mkString(",")
    s"""{"type":"Polygon","coordinates":[[$ring]]}"""
  }

  /** One feature line: properties key-sorted; numeric/boolean values pass
    * through, everything else is escaped as a string. */
  def feature(geometry: String, props: Seq[(String, Any)]): String = {
    val kv = props.sortBy(_._1).map {
      case (k, v: Int) => s""""${escape(k)}":$v"""
      case (k, v: Long) => s""""${escape(k)}":$v"""
      case (k, v: Double) => s""""${escape(k)}":${num(v)}"""
      case (k, v: Boolean) => s""""${escape(k)}":$v"""
      case (k, null) => s""""${escape(k)}":null"""
      case (k, v) => s""""${escape(k)}":"${escape(String.valueOf(v))}""""
    }.mkString(",")
    s"""{"type":"Feature","properties":{$kv},"geometry":$geometry}"""
  }

  /** Point-feature geojsonseq lines from a DataFrame with lon/lat columns;
    * remaining columns become properties. Write with `.write.text(path)`. */
  def pointFeatures(df: DataFrame, lonCol: String = "lon", latCol: String = "lat"): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fieldNames.toSeq
    val li = cols.indexOf(lonCol); val la = cols.indexOf(latCol)
    require(li >= 0 && la >= 0, s"missing $lonCol/$latCol")
    df.map { row =>
      val props = cols.indices.collect {
        case i if i != li && i != la => cols(i) -> row.get(i)
      }
      feature(pointGeometry(row.getDouble(li), row.getDouble(la)), props.toSeq)
    }
  }
}
