package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.geo.Geo

/** The changeset pipeline (reference: changesets/index.js + changesets/
  * map-changeset-parser.js): CSV rows with a JSON tag bag → bbox polygon (or
  * degenerate point), spherical area with a < 2500 km² filter, hashtag
  * tokenizing, `hotosm` detection, date parse — re-expressed as one
  * declarative Column chain over `spark.read.csv`.
  */
object Changesets {

  /** The reference's injected header list (changesets/index.js:17). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("tags", StringType),
    StructField("created_at", StringType),
    StructField("min_lat", DoubleType), StructField("max_lat", DoubleType),
    StructField("min_lon", DoubleType), StructField("max_lon", DoubleType),
    StructField("num_changes", IntegerType),
    StructField("uid", LongType), StructField("user", StringType)))

  val MaxAreaKm2 = 2500.0

  /** CSV (no header row, quoted JSON field, possibly multiline) → parsed rows.
    * Mirrors changesets/map-changeset-parser.js:13-80. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.schema(schema)
      .option("header", "false").option("multiLine", "true").csv(path))

  def parse(raw: DataFrame): DataFrame = {
    val areaUdf = udf { (w: Double, s: Double, e: Double, n: Double) =>
      Geo.bboxAreaKm2(w, s, e, n)
    }
    raw
      .withColumn("area_km2", areaUdf(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")))
      // area filter (:32 via index.js:26 maxAreaKM)
      .filter(col("area_km2") < MaxAreaKm2)
      // degenerate bbox -> Point (:27-30)
      .withColumn("geom_type",
        when(col("min_lat") === col("max_lat") && col("min_lon") === col("max_lon"), "Point")
          .otherwise("Polygon"))
      // tags JSON parse (:34)
      .withColumn("tag_map", from_json(col("tags"), MapType(StringType, StringType)))
      .withColumn("comment", coalesce(col("tag_map")("comment"), lit("")))
      // hashtags: whitespace tokens starting with '#', lowercased (:36-46)
      .withColumn("hashtags",
        array_distinct(transform(
          filter(split(col("comment"), " "), t => t.startsWith("#")),
          t => lower(t))))
      // HOT detection: comment contains 'hotosm' (:48-52)
      .withColumn("hot", col("comment").contains("hotosm"))
      // date parse -> unix seconds (:61)
      .withColumn("ts", unix_timestamp(col("created_at")))
      .select(col("id").as("cs_id"), col("uid"), col("user"), col("comment"),
        col("area_km2"), col("geom_type"), col("hashtags"), col("hot"),
        col("ts"), col("num_changes"))
  }

  /** Deterministic in-memory fixture covering the reference's cases:
    * hashtags incl. #hotosm, degenerate point bbox, >2500 km² rejection,
    * quoted JSON with embedded commas. */
  def fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (1L, """{"comment":"#hotosm-task-123 mapping #Buildings","source":"esri"}""",
        "2020-01-24 20:34:15", 10.0, 10.2, 20.0, 20.2, 40, 7L, "alice"),
      (2L, """{"comment":"small fix"}""",
        "2020-01-25 08:00:00", -5.0, -5.0, 30.0, 30.0, 1, 8L, "bob"), // degenerate -> Point
      (3L, """{"comment":"#import big area"}""",
        "2020-02-01 12:00:00", 0.0, 40.0, 0.0, 40.0, 900, 9L, "carol"), // huge -> rejected
      (4L, """{"source":"gps"}""",
        "2020-02-02 09:30:00", 48.0, 48.2, 2.0, 2.2, 12, 10L, "dave") // no comment
    )
    parse(rows.toDF(schema.fieldNames: _*)
      .withColumn("num_changes", col("num_changes").cast("int")))
  }

  /** Hashtag counting across changesets (A13): explode + count. */
  def hashtagCounts(parsed: DataFrame): DataFrame =
    parsed.select(explode(col("hashtags")).as("tag"))
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
}
