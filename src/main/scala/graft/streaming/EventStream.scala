package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's latent streaming
  * semantics (SURVEY.md §2.9): the reference is pure batch, but its daily
  * tumbling aggregation (`floor(ts/86400)`, A2/A4) and its append-only
  * weekly/monthly changeset ingestion (changesets/README.md:47) map exactly
  * onto event-time windows + watermarks and incremental batch.
  *
  * These transforms take an unbounded DataFrame (from `readStream`) and are
  * equally valid on a bounded one — the tests drive them with MemoryStream.
  */
object EventStream {

  /** A2/A4 as a stream: 1-day tumbling window on event time, 2-day watermark
    * for late data, distinct editors via approx sketch (exact countDistinct
    * is not incrementalizable). */
  def dailyCounts(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "2 days")
      .groupBy(window(col(tsCol), "1 day").as("day"))
      .agg(
        count(lit(1)).as("n_edits"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(col("day.start").as("day_start"), col("n_edits"), col("n_users_approx"))

  /** The flagship per-tile rollup as a stream: geotagged feature events →
    * z-cell assignment (same codegen Column encoder as the batch pipeline) →
    * per-(day-window, tile) counts under a 1-day watermark. This is the
    * incremental form of tilePointSummaries: at 10^12 rows/day the state
    * store holds only the open windows' (tile → counters) and late data past
    * the watermark is dropped deterministically (asserted in StreamingSpec). */
  def tileRollupStream(feats: DataFrame, tsCol: String = "ts",
                       lonCol: String = "lon", latCol: String = "lat",
                       z: Int = 12, userCol: String = "user_id"): DataFrame =
    feats
      .withColumn("tile", graft.index.Quadkey.cellIdCol(col(lonCol), col(latCol), z))
      .withWatermark(tsCol, "1 day")
      .groupBy(window(col(tsCol), "1 day").as("day"), col("tile"))
      .agg(count(lit(1)).as("n_edits"),
        approx_count_distinct(col(userCol)).as("n_users_approx"))
      .select(col("day.start").as("day_start"), col("tile"), col("n_edits"),
        col("n_users_approx"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class MvOut(user_id: Long, ts: java.sql.Timestamp, mv: Int)
  final case class MvState(seg: Long, mv: Int)

  /** W4's stateful minor-version counter as arbitrary streaming state:
    * per user, the counter increments on minor events and resets on majors —
    * `flatMapGroupsWithState`, the streaming analog of the reference's
    * per-entity mutable counter (InteractionsBuilder.java:221,322,344).
    * Assumes per-user event-time order within a batch (sorted input). */
  def minorVersionCounter(events: Dataset[Ev]): Dataset[MvOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroupsWithState[MvState, MvOut](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (uid: Long, it: Iterator[Ev], state: GroupState[MvState]) =>
        var st = state.getOption.getOrElse(MvState(0L, 0))
        val out = it.toSeq.sortBy(_.ts.getTime).map { e =>
          val isMajor = e.event_type == "signup" || e.event_type == "purchase"
          st = if (isMajor) MvState(st.seg + 1, 0) else MvState(st.seg, st.mv + 1)
          MvOut(uid, e.ts, if (isMajor) 0 else st.mv)
        }
        state.update(st)
        out.iterator
    }
  }
}
