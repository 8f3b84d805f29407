package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Secondary sort + streaming group iteration — the mapPartitions shape for
  * per-entity sequential logic whose state doesn't fit a window function
  * (parsers, session machines, format writers). `repartition(key)` +
  * `sortWithinPartitions(key, order)` gives each partition its groups
  * CONTIGUOUS and internally ordered, so one forward pass with O(1) carry
  * state handles every group — no per-group materialization (a window's
  * sort buffer holds the partition anyway; a groupByKey + sortBy inside
  * the group would materialize each group on the heap, which a 10^8-event
  * user would OOM). This is the classic repartitionAndSortWithinPartitions
  * pattern expressed against Dataset (Catalyst plans the sort; Tungsten
  * spills it), kept deliberately as the LAST-RESORT tier the build plan
  * allows for genuinely imperative per-partition logic.
  *
  * SortedGroupsSpec pins the plan (exactly one exchange; the sort is
  * partition-local, not global) and the group-contiguity invariant the
  * pass depends on.
  */
object SortedGroups {

  final case class UserSig(user_id: Long, n_events: Long, first5: String, last_us: Long)

  /** Gate query (q93): per user, the event count, the comma-joined first 5
    * event types in time order, and the last timestamp — a signature only
    * computable from an ORDERED scan of the group. Oracle: DuckDB ordered
    * list aggregation. */
  def userSignatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"))
      .as[(Long, Long, String)](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
    ev.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"))
      .mapPartitions { it =>
        new Iterator[UserSig] {
          private var pending: Option[(Long, Long, String)] = None
          def hasNext: Boolean = pending.isDefined || it.hasNext
          def next(): UserSig = {
            // (user_id, ts) unique (AsofSpec) → `us` strictly increases
            // within a group; one carry tuple is the entire state
            val first = pending.getOrElse(it.next()); pending = None
            val uid = first._1
            var n = 1L; var lastUs = first._2
            val head = scala.collection.mutable.ArrayBuffer(first._3)
            var done = false
            while (!done && it.hasNext) {
              val row = it.next()
              if (row._1 != uid) { pending = Some(row); done = true }
              else {
                n += 1; lastUs = row._2
                if (head.size < 5) head += row._3
              }
            }
            UserSig(uid, n, head.mkString(","), lastUs)
          }
        }
      }(Encoders.product[UserSig])
      .toDF()
  }
}
