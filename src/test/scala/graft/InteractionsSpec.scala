package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Interactions
import graft.ops.Interactions.VersionRow

class InteractionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sq1 = (Array(10.0, 10.0009, 10.0009, 10.0, 10.0), Array(0.0, 0.0, 0.0009, 0.0009, 0.0))
  private val sq2 = (Array(10.0001, 10.001, 10.001, 10.0001, 10.0001), Array(0.0, 0.0, 0.0009, 0.0009, 0.0))
  // sq1 with the ring start rotated by one vertex — the SAME polygon
  private val sq1rot = (Array(10.0009, 10.0009, 10.0, 10.0, 10.0009), Array(0.0, 0.0009, 0.0009, 0.0, 0.0))
  // sq1 traversed in reverse orientation — also the SAME polygon
  private val sq1rev = (Array(10.0, 10.0, 10.0009, 10.0009, 10.0), Array(0.0, 0.0009, 0.0009, 0.0, 0.0))

  private def v(id: Long, ver: Int, ts: Long, uid: Long, tags: Map[String, String],
                visible: Boolean = true, g: (Array[Double], Array[Double]) = sq1,
                etype: String = "way") =
    VersionRow(id, etype, ver, ts, uid, ts / 10, tags, visible, g._1, g._2)

  test("hand fixture classifies row-for-row like the reference semantics") {
    val versions = Seq(
      // entity 1: CRE -> MAV (tag mod) -> MIV (geom only, same version) -> DEL
      v(1, 1, 100, 10, Map("building" -> "yes")),
      v(1, 2, 200, 11, Map("building" -> "no")),
      v(1, 2, 300, 12, Map("building" -> "no"), g = sq2),
      v(1, 2, 400, 13, Map("building" -> "no"), visible = false, g = sq2),
      // entity 2: CRE -> MAG (geom, version bump, tags same) -> unchanged (suppressed? no: last -> splice)
      v(2, 1, 100, 20, Map("highway" -> "primary")),
      v(2, 2, 200, 21, Map("highway" -> "primary"), g = sq2),
      v(2, 2, 300, 22, Map("highway" -> "primary"), g = sq2)
    ).toDS()

    val out = Interactions.classify(versions.toDF())
      .orderBy(col("id"), col("vs")).collect()

    val e1 = out.filter(_.getLong(0) == 1)
    assert(e1.map(_.getAs[String]("e")).toSeq == Seq("CRE", "MAV", "MIV", "DEL"))
    // CRE: @aA = full tags, vu = next ts
    assert(e1(0).getAs[Map[String, String]]("a_a") == Map("building" -> "yes"))
    assert(e1(0).getAs[Long]("vu") == 200L)
    // MAV: modified map carries (before, after)
    assert(e1(1).getAs[Map[String, scala.collection.Seq[String]]]("a_m").map { case (k, v) => k -> v.toSeq } == Map("building" -> Seq("yes", "no")))
    assert(e1(1).getAs[Map[String, String]]("a_a") == Map.empty)
    // MIV: mv counter = 1, sq present (geometry changed between squares)
    assert(e1(2).getAs[Long]("mv") == 1L)
    assert(!e1(2).isNullAt(e1(2).fieldIndex("sq")))
    // DEL: valid exactly 1s, duid = previous owner, aD = previous tags
    assert(e1(3).getAs[Long]("vu") == e1(3).getAs[Long]("vs") + 1)
    assert(e1(3).getAs[Long]("duid") == 12L)
    assert(e1(3).getAs[Map[String, String]]("a_d") == Map("building" -> "no"))

    val e2 = out.filter(_.getLong(0) == 2)
    assert(e2.map(_.getAs[String]("e")).toSeq == Seq("CRE", "MAG", null))
    // MAG: squaring delta of two perfect squares ~ 0.0 at 4dp
    assert(math.abs(e2(1).getAs[Double]("sq")) < 0.01)
    // suppressed-unless-last: the unchanged latest row survives with no @e,
    // carrying the current-tags splice (reference :251-258)
    assert(e2(2).getAs[Map[String, String]]("current_tags") == Map("highway" -> "primary"))
  }

  test("normalized geometry equality: rotated or reversed rings are UNCHANGED for ways") {
    val versions = Seq(
      v(1, 1, 100, 10, Map("building" -> "yes")),
      v(1, 1, 200, 11, Map("building" -> "yes"), g = sq1rot), // same polygon, rotated start
      v(1, 1, 300, 12, Map("building" -> "yes"), g = sq1rev), // same polygon, reversed
      v(1, 1, 400, 13, Map("building" -> "yes"), g = sq2)     // actually moved -> MIV
    ).toDS()
    val out = Interactions.classify(versions.toDF()).orderBy(col("vs")).collect()
    // rotation/reversal rows are suppressed entirely (no interaction) —
    // InteractionsBuilder.java:511-530 equalsNorm; only CRE + the real move remain
    assert(out.map(_.getAs[String]("e")).toSeq == Seq("CRE", "MIV"))
    assert(out(1).getAs[Long]("vs") == 400L)
    assert(out(1).getAs[Long]("mv") == 1L) // counts 1, not 3: rotations never incremented it
  }

  test("canonicalKey: ring with a DUPLICATED minimal vertex is rotation-stable") {
    // self-touching ring visiting (0,0) twice: rotations must canonicalize to
    // the same key (the tie on the minimal vertex means every tied start
    // competes; picking the first tied index broke this)
    val lonsA = Array(0.0, 1.0, 0.0, 0.0, 0.0); val latsA = Array(0.0, 0.0, 0.0, 1.0, 0.0)
    val lonsB = Array(0.0, 0.0, 0.0, 1.0, 0.0); val latsB = Array(0.0, 1.0, 0.0, 0.0, 0.0)
    val ka = Interactions.canonicalKey("way", lonsA, latsA).toSeq
    val kb = Interactions.canonicalKey("way", lonsB, latsB).toSeq
    assert(ka == kb, s"$ka vs $kb")
  }

  test("relations compare RAW coordinates: a rotated ring IS a minor version") {
    val versions = Seq(
      v(1, 1, 100, 10, Map("type" -> "multipolygon"), etype = "relation"),
      v(1, 1, 200, 11, Map("type" -> "multipolygon"), g = sq1rot, etype = "relation")
    ).toDS()
    val out = Interactions.classify(versions.toDF()).orderBy(col("vs")).collect()
    assert(out.map(_.getAs[String]("e")).toSeq == Seq("CRE", "MIV"))
  }

  test("checkMinorVersion latch: restriction relations NEVER emit MIV (ref :234-241,:321)") {
    val versions = Seq(
      v(1, 1, 100, 10, Map("type" -> "restriction", "restriction" -> "no_left_turn"), etype = "relation"),
      v(1, 1, 200, 11, Map("type" -> "restriction", "restriction" -> "no_left_turn"), g = sq2, etype = "relation"),
      v(1, 2, 300, 12, Map("type" -> "restriction", "restriction" -> "no_left_turn"), g = sq1, etype = "relation"),
      // control: same shape WITHOUT the restriction tag emits the MIV
      v(2, 1, 100, 20, Map("type" -> "multipolygon"), etype = "relation"),
      v(2, 1, 200, 21, Map("type" -> "multipolygon"), g = sq2, etype = "relation")
    ).toDS()
    val out = Interactions.classify(versions.toDF()).orderBy(col("id"), col("vs")).collect()
    val e1 = out.filter(_.getLong(0) == 1)
    // the same-version geometry change is suppressed; the version bump is MAG
    assert(e1.map(_.getAs[String]("e")).toSeq == Seq("CRE", "MAG"))
    val e2 = out.filter(_.getLong(0) == 2)
    assert(e2.map(_.getAs[String]("e")).toSeq == Seq("CRE", "MIV"))
  }

  test("version bump precedence (ref :341-405): geometry change wins MAG, tag diffs still attach; bare bump is MAV") {
    val versions = Seq(
      // bump with BOTH tag change and geometry change -> MAG carrying @aM
      v(1, 1, 100, 10, Map("building" -> "yes")),
      v(1, 2, 200, 11, Map("building" -> "no"), g = sq2),
      // bump with nothing changed -> bare MAV (ref :400), no diffs
      v(2, 1, 100, 20, Map("building" -> "yes")),
      v(2, 2, 200, 21, Map("building" -> "yes"))
    ).toDS()
    val out = Interactions.classify(versions.toDF()).orderBy(col("id"), col("vs")).collect()
    val r1 = out.filter(_.getLong(0) == 1)(1)
    assert(r1.getAs[String]("e") == "MAG")
    assert(r1.getAs[Map[String, scala.collection.Seq[String]]]("a_m")
      .map { case (k, v) => k -> v.toSeq } == Map("building" -> Seq("yes", "no")))
    assert(!r1.isNullAt(r1.fieldIndex("sq")))
    val r2 = out.filter(_.getLong(0) == 2)(1)
    assert(r2.getAs[String]("e") == "MAV")
    assert(r2.getAs[Map[String, String]]("a_a") == Map.empty)
    assert(r2.getAs[Map[String, String]]("a_d") == Map.empty)
  }

  test("deletions overwrite the current-tags splice (ref :294 assigns, not appends)") {
    val versions = Seq(
      v(1, 1, 100, 10, Map("building" -> "yes")),
      v(1, 1, 200, 11, Map("building" -> "yes"), visible = false)
    ).toDS()
    val out = Interactions.classify(versions.toDF()).orderBy(col("vs")).collect()
    assert(out(1).getAs[String]("e") == "DEL")
    assert(out(1).isNullAt(out(1).fieldIndex("current_tags")))
  }

  test("tags -> JSON (X6): classifier maps serialize deterministically through to_json") {
    val out = Interactions.classify(Interactions.synthVersions(spark, 40).toDF())
      .filter(col("e") === "CRE")
      .select(col("id"), to_json(map_from_entries(array_sort(map_entries(col("a_a"))))).as("j"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val j = r.getString(1)
      assert(j.startsWith("{") && j.endsWith("}") && j.contains("\"building\":"), j)
    }
  }

  test("tag-diff property: applying (aA, aM, aD) to before yields after") {
    val versions = Interactions.synthVersions(spark, 80)
    val out = Interactions.classify(versions.toDF())
      .filter(col("e").isin("MAV", "MAG"))
      .join(versions.toDF().select(col("id"), col("ts").as("vs"), col("tags").as("after_tags")),
        Seq("id", "vs"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val aA = r.getAs[Map[String, String]]("a_a")
      val aM = r.getAs[Map[String, scala.collection.Seq[String]]]("a_m")
      val aD = r.getAs[Map[String, String]]("a_d")
      val after = r.getAs[Map[String, String]]("after_tags")
      // reconstruct before from after and the diff, then re-apply
      val before = (after -- aA.keys) ++ aD ++ aM.map { case (k, ba) => k -> ba(0) }
      val reApplied = (before -- aD.keys) ++ aA ++ aM.map { case (k, ba) => k -> ba(1) }
      assert(reApplied == after, s"row $r")
    }
  }

  test("every entity's intervals chain: vu(k) == vs(k+1), null only at the end") {
    val out = Interactions.classify(Interactions.synthVersions(spark, 60).toDF())
      .filter(col("e").isNotNull && col("e") =!= "DEL")
      .select(col("id"), col("vs"), col("vu")).collect()
      .groupBy(_.getLong(0))
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.init.foreach(r => assert(!r.isNullAt(2)))
    }
  }

  test("mv counter resets on version bump across synthetic entities") {
    val out = Interactions.classify(Interactions.synthVersions(spark, 120).toDF())
      .filter(col("e") === "MIV")
      .select(col("id"), col("v"), col("vs"), col("mv")).collect()
      .groupBy(r => (r.getLong(0), r.getInt(1)))
    out.foreach { case (_, rows) =>
      val ms = rows.sortBy(_.getLong(2)).map(_.getLong(3)).toSeq
      assert(ms == (1L to ms.size.toLong), s"mv sequence $ms") // 1,2,3,... within a version segment
    }
  }

  test("DEL rows valid exactly 1 second, everywhere") {
    val out = Interactions.classify(Interactions.synthVersions(spark, 150).toDF())
      .filter(col("e") === "DEL").select(col("vs"), col("vu")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(1) == r.getLong(0) + 1))
  }

  test("synthetic table exercises every edit class and both latch sides") {
    val out = Interactions.classify(Interactions.synthVersions(spark, 200).toDF())
    val classes = out.groupBy(col("e")).count().collect()
      .map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    assert(Set("CRE", "DEL", "MAV", "MAG", "MIV", "null").subsetOf(classes.keySet), classes.toString)
    // rotation rows (kind 8) for ways must all be suppressed: MIV only from
    // kind 7 (all types) and kind 8 (relations)
    val mivWays = out.filter(col("e") === "MIV" && col("etype") === "way")
      .select(col("id"), col("vs")).collect()
    mivWays.foreach { r =>
      val k = ((r.getLong(1) - 1500000000L - r.getLong(0) * 1000) / 10).toInt
      assert(Interactions.kindOf(r.getLong(0), k) == 7, s"way MIV from kind != 7 at $r")
    }
  }
}
