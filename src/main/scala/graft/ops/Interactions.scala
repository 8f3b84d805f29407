package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geo.Squaring
import graft.synth.ImageSynth.mix

/** The reference's interaction classifier (InteractionsBuilder.java:216-468),
  * re-expressed as pure window algebra over a versions table — one row per
  * (entity, version-event), timestamp-ascending per entity.
  *
  * Classification (SURVEY.md §1.1):
  *  - CRE  first visible version; `@aA` = full tag map (:262-271)
  *  - DEL  visible=false; valid exactly 1 s (`@vU = @vS+1`, :300-301);
  *         `@duid` = previous owner (:540-541); `@aD` = full previous tags
  *  - MAV  version bump + tag change; `@aA/@aM/@aD` diffs (:356-378)
  *  - MAG  version bump, tags unchanged, geometry changed; `@sq` = squaring
  *         delta after−before, polygons only (:588-597)
  *  - MIV  same version, geometry changed; `@mV` counts minors since the
  *         last major and resets on version bump (:221,322,344)
  *  - unchanged rows are suppressed (EMPTY_CONTRIBS, :440-453) unless they
  *    are the entity's latest version (current-tags splice keeps them, :251-258)
  *
  * One shuffle (by entity id) — the Spark analog of OSHDB's colocated
  * per-entity history (SURVEY.md §2.3 note).
  */
object Interactions {

  final case class VersionRow(id: Long, version: Int, ts: Long, uid: Long,
                              changeset: Long, tags: Map[String, String],
                              visible: Boolean,
                              lons: Array[Double], lats: Array[Double])

  /** versions → interactions. Input must carry the VersionRow columns. */
  def classify(versions: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("ts"))
    val sqUdf = udf { (aLons: Seq[Double], aLats: Seq[Double],
                       bLons: Seq[Double], bLats: Seq[Double]) =>
      if (aLons == null || bLons == null || aLons.size < 4 || bLons.size < 4) null
      else java.lang.Double.valueOf(Squaring.squaringDelta(
        aLons.toArray, aLats.toArray, bLons.toArray, bLats.toArray))
    }

    val staged = versions
      .withColumn("rn", row_number().over(w))
      .withColumn("vu_next", lead(col("ts"), 1).over(w))
      .withColumn("p_uid", lag(col("uid"), 1).over(w))
      .withColumn("p_tags", lag(col("tags"), 1).over(w))
      .withColumn("p_version", lag(col("version"), 1).over(w))
      .withColumn("p_lons", lag(col("lons"), 1).over(w))
      .withColumn("p_lats", lag(col("lats"), 1).over(w))
      .withColumn("is_last", lead(col("ts"), 1).over(w).isNull)

    // maps aren't orderable in Spark, so equality = no differing entry across
    // the key union (map_zip_with pads missing keys with null)
    val tagsDiffCount = size(map_filter(
      map_zip_with(col("tags"), col("p_tags"), (_, a, b) =>
        when(a <=> b, lit(null).cast("int")).otherwise(lit(1))),
      (_, vv) => vv.isNotNull))
    val tagsChanged = col("p_tags").isNull || tagsDiffCount > 0
    val geomChanged = !(col("lons") <=> col("p_lons")) || !(col("lats") <=> col("p_lats"))
    val versionBump = col("p_version").isNull || (col("version") > col("p_version"))

    val classified = staged.withColumn("e",
      when(col("rn") === 1 && col("visible"), "CRE")
        .when(!col("visible"), "DEL")
        .when(versionBump && tagsChanged, "MAV")
        .when(versionBump && geomChanged, "MAG")
        .when(!versionBump && geomChanged, "MIV")
        .otherwise(lit(null).cast("string")))

    // @mV: running count of MIVs within the (id, version) segment — version
    // bumps start a fresh segment, replicating the reset (:322,344)
    val mvW = Window.partitionBy(col("id"), col("version")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMv = classified.withColumn("mv",
      when(col("e") === "MIV",
        sum(when(col("e") === "MIV", 1).otherwise(0)).over(mvW)).otherwise(lit(null)))

    // tag diffs as deterministic maps (Maps.difference analog, :356-378)
    val added = map_filter(col("tags"), (k, _) => not(array_contains(map_keys(col("p_tags")), k)))
    val deleted = map_filter(col("p_tags"), (k, _) => not(array_contains(map_keys(col("tags")), k)))
    val modified = map_filter(
      map_zip_with(col("tags"), col("p_tags"), (_, a, b) =>
        when(a.isNotNull && b.isNotNull && a =!= b, array(b, a)).otherwise(lit(null))),
      (_, v) => v.isNotNull)

    withMv.select(
      col("id"), col("version").as("v"), col("uid"), col("changeset").as("c"),
      col("e"),
      col("ts").as("vs"),
      when(col("e") === "DEL", col("ts") + 1).otherwise(col("vu_next")).as("vu"),
      when(col("e") === "DEL", col("p_uid")).as("duid"),
      col("mv"),
      when(col("e") === "CRE", col("tags"))
        .when(col("e") === "MAV", added).as("a_a"),
      when(col("e") === "MAV", modified).as("a_m"),
      when(col("e") === "DEL", col("p_tags"))
        .when(col("e") === "MAV", deleted).as("a_d"),
      when(col("e").isin("MAG", "MIV"),
        sqUdf(col("lons"), col("lats"), col("p_lons"), col("p_lats"))).as("sq"),
      when(col("is_last"), col("tags")).as("current_tags"),
      col("is_last"))
      // suppression: a row must carry an edit class OR be the spliced latest
      .filter(col("e").isNotNull || col("is_last"))
      .drop("is_last")
  }

  /** Deterministic synthetic versions table exercising every branch:
    * creations, tag add/mod/delete, geometry moves (squares with known
    * squaring), same-version minor edits, deletions, unchanged latest rows. */
  def synthVersions(spark: SparkSession, nEntities: Int, parts: Int = 4): Dataset[VersionRow] = {
    import spark.implicits._
    spark.range(0, nEntities, 1, parts).flatMap { id =>
      val seed = mix(id * 31 + 5)
      val nVers = 2 + ((mix(seed ^ 1) & 0x7FFF) % 5).toInt // 2..6 events
      var version = 1
      var tags = Map("building" -> "yes", s"name" -> s"obj$id")
      var shift = 0.0
      (0 until nVers).map { k =>
        val kind = ((mix(seed ^ (k + 17)) & 0x7FFF) % 10).toInt
        val ts = 1500000000L + id * 1000 + k * 10
        val visible = kind != 9 || k == 0 // kind 9 (not first) = deletion
        if (k > 0 && visible) kind match {
          case x if x < 3 => version += 1; tags = tags + ("building" -> s"v$version") // MAV: tag mod
          case 3 => version += 1; tags = tags + (s"k$k" -> "new") // MAV: tag add
          case 4 => version += 1; tags = tags - "name" // MAV: tag delete
          case 5 | 6 => version += 1; shift += 0.0001 // MAG: geometry moves
          case 7 => shift += 0.00005 // MIV: same version, geometry change
          case _ => () // unchanged (suppressed unless last)
        }
        val base = 10.0 + (id % 100) * 0.01 + shift
        VersionRow(id, version, ts, (mix(seed ^ (k + 23)) & 0x7FFF) % 50,
          id * 100 + k, tags, visible,
          Array(base, base + 0.0009, base + 0.0009, base, base),
          Array(0.0, 0.0, 0.0009, 0.0009, 0.0))
      }
    }
  }
}
