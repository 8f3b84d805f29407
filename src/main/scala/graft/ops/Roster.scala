package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Session.table

/** Editor-roster matching (reference: util/map-contribution-extractor.js:93-144
  * + util/README.md:22-30): features match a roster row by uid when the
  * roster entry has one, else by handle; a handle match is suppressed when
  * the same user was already uid-matched (precedence dedup, :128-135); each
  * contributor may carry a personal `[f, t)` validity window that filters
  * their edits (:110-116).
  *
  * Spark shape: the roster is tiny → broadcast both probes; precedence is a
  * left join on uid, then a handle join *restricted to uid-misses* via
  * coalesce — two broadcast hash joins, zero shuffles of the fact side.
  */
object Roster {

  final case class Editor(u: Option[Long], h: String, c: String,
                          f: Option[Long], t: Option[Long])

  /** Deterministic roster fixture over the events table's uid space (0..149):
    * uid members, one handle-only member, windows that exclude some edits. */
  def fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ((0L until 150L by 3L).map(u => Editor(Some(u), s"user$u",
      Seq("kll", "msf", "dcx", "hot")((u % 4).toInt),
      if (u % 9 == 0) Some(1704067200L + 86400L * 7) else None, // f: active from day 7
      if (u % 15 == 0) Some(1704067200L + 86400L * 20) else None)) ++ Seq(
      // handle-only member: uid 7 is not in the uid roster, matches via handle
      Editor(None, "user7", "msf", None, None),
      // precedence collision: uid 6 is uid-matched (dcx); this handle row must lose
      Editor(None, "user6", "hot", None, None)))
      .toDS().toDF()
  }

  /** Events joined to the roster with uid-over-handle precedence and
    * per-contributor time windows. Returns (team, day) edit counts. */
  def rosterRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .withColumn("ts_s", unix_timestamp(col("ts")))
      .withColumn("handle", concat(lit("user"), col("user_id"))) // QA-tile @user analog
    val roster = fixture(spark)

    val byUid = roster.filter(col("u").isNotNull)
      .select(col("u"), col("c").as("c_uid"), col("f").as("f_uid"), col("t").as("t_uid"))
    val byHandle = roster.filter(col("u").isNull)
      .select(col("h"), col("c").as("c_h"), col("f").as("f_h"), col("t").as("t_h"))

    val joined = ev
      .join(broadcast(byUid), ev("user_id") === byUid("u"), "left")
      .join(broadcast(byHandle), ev("handle") === byHandle("h"), "left")
      // precedence: uid match wins; handle match only when uid missed (U2)
      .withColumn("team", coalesce(col("c_uid"), col("c_h")))
      .withColumn("f_eff", when(col("c_uid").isNotNull, col("f_uid")).otherwise(col("f_h")))
      .withColumn("t_eff", when(col("c_uid").isNotNull, col("t_uid")).otherwise(col("t_h")))
      .filter(col("team").isNotNull)
      // per-contributor window: ts > f and ts <= t when present (F7, :110-116)
      .filter(col("f_eff").isNull || col("ts_s") > col("f_eff"))
      .filter(col("t_eff").isNull || col("ts_s") <= col("t_eff"))

    joined.groupBy(col("team"), floor(col("ts_s") / 86400L).cast("long").as("day"))
      .agg(count(lit(1)).as("n_edits"), countDistinct(col("user_id")).as("n_editors"))
  }

  /** DuckDB oracle for [[rosterRollup]] — the roster fixture as inline VALUES. */
  val rosterRollupOracle: String = {
    val rows = ((0L until 150L by 3L).map { u =>
      val c = Seq("kll", "msf", "dcx", "hot")((u % 4).toInt)
      val f = if (u % 9 == 0) (1704067200L + 86400L * 7).toString else "NULL"
      val t = if (u % 15 == 0) (1704067200L + 86400L * 20).toString else "NULL"
      s"($u, 'user$u', '$c', $f, $t)"
    } ++ Seq("(NULL, 'user7', 'msf', NULL, NULL)", "(NULL, 'user6', 'hot', NULL, NULL)")).mkString(",")
    s"""WITH roster(u, h, c, f, t) AS (VALUES $rows),
       e AS (SELECT user_id, floor(epoch(ts))::BIGINT AS ts_s, 'user' || user_id AS handle FROM events),
       j AS (SELECT e.user_id, e.ts_s,
               coalesce(ru.c, rh.c) AS team,
               CASE WHEN ru.c IS NOT NULL THEN ru.f ELSE rh.f END AS f_eff,
               CASE WHEN ru.c IS NOT NULL THEN ru.t ELSE rh.t END AS t_eff
             FROM e
             LEFT JOIN (SELECT * FROM roster WHERE u IS NOT NULL) ru ON e.user_id = ru.u
             LEFT JOIN (SELECT * FROM roster WHERE u IS NULL) rh ON e.handle = rh.h)
       SELECT team, floor(ts_s/86400)::BIGINT AS day,
              count(*)::BIGINT AS n_edits, count(DISTINCT user_id)::BIGINT AS n_editors
       FROM j WHERE team IS NOT NULL
         AND (f_eff IS NULL OR ts_s > f_eff)
         AND (t_eff IS NULL OR ts_s <= t_eff)
       GROUP BY 1, 2"""
  }
}
