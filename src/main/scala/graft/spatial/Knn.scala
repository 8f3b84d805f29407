package graft.spatial

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.index.Hex

/** k-nearest-neighbour over a big point table vs a small query set
  * (north_rule: "kNN via H3 ring expansion").
  *
  * Scale design: queries are tiny → broadcast; the point table is never
  * shuffled in full. Two stages:
  *  1. *Ring prefilter* (pure cell arithmetic): keep only points whose hex
  *     cell lies within `k`-ring distance of some query's cell. Ring radius
  *     starts small and is grown geometrically until every query has enough
  *     candidates **and** the ring's guaranteed-covered radius exceeds the
  *     kth candidate distance (exactness proof: any point outside ring R is
  *     at least (R−1)·inradius away in degree space).
  *  2. Per-partition bounded top-k heaps merged via `reduceByKey`-style
  *     `flatMapGroups` — only Q·k rows ever shuffle.
  *
  * Distance metric: Euclidean in degree space (documented; callers wanting
  * great-circle rank should pre-project). Ties broken by point id so results
  * are deterministic and oracle-comparable.
  */
object Knn {
  final case class QueryPoint(qid: Long, lon: Double, lat: Double)

  /** Exact kNN: returns (qid, point_id, rank) with rank 1..k by
    * (distance, point_id). `points` needs columns (idCol, lonCol, latCol). */
  def knn(points: DataFrame, queries: Seq[QueryPoint], k: Int,
          idCol: String = "id", lonCol: String = "lon", latCol: String = "lat",
          res: Int = 7): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val pts = points.select(
      col(idCol).cast("long").as("pid"),
      col(lonCol).cast("double").as("lon"),
      col(latCol).cast("double").as("lat"))

    // ring expansion: grow until the prefilter provably contains the true kNN
    var ring = 2
    var result: Array[(Long, Long, Double)] = null
    var done = false
    while (!done) {
      val cand = candidatesWithin(pts, queries, k, ring, res)
      val inradius = Hex.edgeDeg(res) * math.sqrt(3.0) / 2.0
      val safeDist = (ring - 1).toDouble * inradius // any excluded point is farther than this
      val ok = queries.forall { q =>
        val mine = cand.filter(_._1 == q.qid)
        mine.length >= k && mine.map(_._3).max <= safeDist * safeDist
      }
      if (ok || ring > 1024) { result = cand; done = true } else ring *= 2
    }
    result.toSeq.toDF("qid", "pid", "dist2")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"dist2", $"pid")))
      .select($"qid", $"pid", $"rank")
  }

  /** One prefilter+topk pass at a fixed ring radius. Returns per query the
    * best-k (qid, pid, dist²) found among ring candidates. */
  private def candidatesWithin(pts: DataFrame, queries: Seq[QueryPoint], k: Int,
                               ring: Int, res: Int): Array[(Long, Long, Double)] = {
    val spark = pts.sparkSession
    // candidate cell set per query (driver-side; |disk| = 3r(r+1)+1, fine for small Q)
    val cellToQids: Map[Long, Array[Long]] = queries
      .flatMap(q => Hex.disk(Hex.latLngToCell(q.lat, q.lon, res), ring).map(c => (c, q.qid)))
      .groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).toArray) }
    val bcCells = spark.sparkContext.broadcast(cellToQids)
    val bcQ = spark.sparkContext.broadcast(queries.map(q => q.qid -> (q.lon, q.lat)).toMap)
    val kk = k

    // per-partition bounded heaps: only Q*k rows leave each partition
    val partial = pts.mapPartitions { it =>
      val cells = bcCells.value; val qs = bcQ.value
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val heaps = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      it.foreach { row =>
        val pid = row.getLong(0); val lon = row.getDouble(1); val lat = row.getDouble(2)
        val cell = Hex.latLngToCell(lat, lon, res)
        cells.get(cell).foreach { qids =>
          var i = 0
          while (i < qids.length) {
            val qid = qids(i)
            val (qlon, qlat) = qs(qid)
            val dx = lon - qlon; val dy = lat - qlat
            val d2 = dx * dx + dy * dy
            val h = heaps.getOrElseUpdate(qid,
              scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
            if (h.size < kk) h.enqueue((d2, pid))
            else if (ord.lt((d2, pid), h.head)) { h.dequeue(); h.enqueue((d2, pid)) }
            i += 1
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) => h.iterator.map { case (d2, pid) => (qid, pid, d2) } }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaDouble)).collect()

    // driver merge (Q*k*partitions rows — tiny)
    partial.groupBy(_._1).iterator.flatMap { case (_, xs) =>
      xs.sortBy(x => (x._3, x._2)).take(kk)
    }.toArray
  }
}
