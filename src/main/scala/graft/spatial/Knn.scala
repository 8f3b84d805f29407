package graft.spatial

import org.apache.spark.sql.DataFrame
import graft.index.Hex

/** k-nearest-neighbour over a big point table vs a small query set
  * (north_rule: "kNN via H3 ring expansion").
  *
  * Scale design: queries are tiny → broadcast; the point table is never
  * shuffled in full, and it is scanned a FIXED number of times (2, plus a
  * rare logged fallback) — no data-dependent rescan loop:
  *
  *  1. *Density pass*: one scan counting points per hex cell, restricted to
  *     cells within `RingCap` of any query (the only cells that can matter).
  *     Only the per-cell counts shuffle — O(|candidate cells|) rows.
  *  2. Driver sizes each query's ring from the counts: the smallest ring r
  *     holding ≥ k points bounds the kth distance by r·2·inradius + 2·edge,
  *     so ring R = 2r+4 provably covers the true kNN (any point outside
  *     ring R is ≥ (R−1)·inradius away — farther than that bound).
  *  3. *Top-k pass*: per-partition bounded heaps over ring candidates — only
  *     Q·k rows leave each partition.
  *  4. The exactness condition (k found ∧ kth distance ≤ safe radius) is
  *     re-verified on the merged result; queries that fail it (under-dense
  *     neighborhoods with < k points inside `RingCap`) fall back to one
  *     exact brute-force scan and the fallback is LOGGED — never silent.
  *
  * Distance metric: Euclidean in degree space (documented; callers wanting
  * great-circle rank should pre-project). Ties broken by point id so results
  * are deterministic and oracle-comparable.
  */
object Knn {
  final case class QueryPoint(qid: Long, lon: Double, lat: Double)

  /** Max ring radius the density pass certifies; |disk| = 3r(r+1)+1 ≈ 12.5k
    * cells per query at the cap — a tiny broadcast. */
  val RingCap = 64

  /** Exact kNN: returns (qid, point_id, rank) with rank 1..k by
    * (distance, point_id). `points` needs columns (idCol, lonCol, latCol). */
  def knn(points: DataFrame, queries: Seq[QueryPoint], k: Int,
          idCol: String = "id", lonCol: String = "lon", latCol: String = "lat",
          res: Int = 7): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    val pts = points.select(
      col(idCol).cast("long").as("pid"),
      col(lonCol).cast("double").as("lon"),
      col(latCol).cast("double").as("lat"))

    // ---- pass 1: per-cell density near the queries --------------------
    val qCells = queries.map(q => q.qid -> Hex.latLngToCell(q.lat, q.lon, res)).toMap
    val candCells: Set[Long] = qCells.values.flatMap(c => Hex.disk(c, RingCap)).toSet
    val counts: Map[Long, Long] = cellCounts(pts, candCells, res)

    // ---- driver: size each query's ring from the density histogram ----
    val inradius = Hex.edgeDeg(res) * math.sqrt(3.0) / 2.0
    val edge = Hex.edgeDeg(res)
    val ringOf: Map[Long, Option[Int]] = queries.map { q =>
      val cell = qCells(q.qid)
      var cum = 0L
      var r = 0
      var found: Option[Int] = None
      while (found.isEmpty && r <= RingCap) {
        Hex.ring(cell, r).foreach(c => cum += counts.getOrElse(c, 0L))
        if (cum >= k) {
          // kth distance ≤ r·(2·inradius) + 2·edge; need (R−1)·inradius ≥ that
          val bound = r * 2.0 * inradius + 2.0 * edge
          found = Some(math.ceil(bound / inradius).toInt + 1)
        }
        r += 1
      }
      q.qid -> found
    }.toMap

    val sized = queries.filter(q => ringOf(q.qid).isDefined)
    val underdense = queries.filterNot(q => ringOf(q.qid).isDefined)

    // ---- pass 2: one top-k pass at the certified per-query rings ------
    val cand =
      if (sized.isEmpty) Array.empty[(Long, Long, Double)]
      else candidatesWithin(pts, sized.map(q => (q, ringOf(q.qid).get)), k, res)

    // exactness re-check (belt and braces: doesn't trust the ring math)
    val (exact, failed) = sized.partition { q =>
      val mine = cand.filter(_._1 == q.qid)
      val safe = (ringOf(q.qid).get - 1).toDouble * inradius
      mine.length >= k && mine.map(_._3).max <= safe * safe
    }

    val fallbackQs = underdense ++ failed
    val fallback =
      if (fallbackQs.isEmpty) Array.empty[(Long, Long, Double)]
      else {
        System.err.println(s"[graft.Knn] exact brute-force fallback for queries " +
          s"${fallbackQs.map(_.qid).sorted.mkString(",")} (under-dense: <$k points within ring $RingCap, " +
          s"or ring certification failed) — one extra full scan")
        bruteTopK(pts, fallbackQs, k)
      }

    // rank driver-side too (the rows are already a driver-local Q·k merge) —
    // a Spark window here would cost an extra exchange for nothing
    val keep = exact.map(_.qid).toSet
    val ranked = (cand.filter(x => keep(x._1)) ++ fallback)
      .groupBy(_._1).toSeq.flatMap { case (qid, xs) =>
        xs.sortBy(x => (x._3, x._2)).take(k).zipWithIndex
          .map { case ((_, pid, _), i) => (qid, pid, i + 1) }
      }
    ranked.toDF("qid", "pid", "rank")
  }

  /** One scan → (cell → count) for the candidate cells only. The per-partition
    * HashMaps ARE the partial aggregates — collect and merge them driver-side
    * (bounded by |candCells| entries each) instead of paying a shuffle. */
  private def cellCounts(pts: DataFrame, candCells: Set[Long], res: Int): Map[Long, Long] = {
    val spark = pts.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(candCells)
    val partials = pts.mapPartitions { it =>
      val cells = bc.value
      val m = new scala.collection.mutable.HashMap[Long, Long]()
      it.foreach { row =>
        val cell = Hex.latLngToCell(row.getDouble(2), row.getDouble(1), res)
        if (cells.contains(cell)) m.update(cell, m.getOrElse(cell, 0L) + 1L)
      }
      m.iterator
    }.collect()
    val merged = new scala.collection.mutable.HashMap[Long, Long]()
    partials.foreach { case (c, n) => merged.update(c, merged.getOrElse(c, 0L) + n) }
    merged.toMap
  }

  /** One prefilter+topk pass with a per-query ring radius. Returns per query
    * the best-k (qid, pid, dist²) found among ring candidates. */
  private def candidatesWithin(pts: DataFrame, queries: Seq[(QueryPoint, Int)], k: Int,
                               res: Int): Array[(Long, Long, Double)] = {
    val spark = pts.sparkSession
    // candidate cell set per query (driver-side; |disk| = 3r(r+1)+1, fine for small Q)
    val cellToQids: Map[Long, Array[Long]] = queries
      .flatMap { case (q, ring) =>
        Hex.disk(Hex.latLngToCell(q.lat, q.lon, res), ring).map(c => (c, q.qid)) }
      .groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).toArray) }
    val bcCells = spark.sparkContext.broadcast(cellToQids)
    val bcQ = spark.sparkContext.broadcast(queries.map { case (q, _) => q.qid -> (q.lon, q.lat) }.toMap)
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

  /** Exact brute force for the (rare, logged) fallback queries: no cell
    * filter, same bounded-heap shape — still only Q·k rows per partition. */
  private def bruteTopK(pts: DataFrame, queries: Seq[QueryPoint], k: Int): Array[(Long, Long, Double)] = {
    val spark = pts.sparkSession
    val bcQ = spark.sparkContext.broadcast(queries.toArray)
    val kk = k
    val partial = pts.mapPartitions { it =>
      val qs = bcQ.value
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
      it.foreach { row =>
        val pid = row.getLong(0); val lon = row.getDouble(1); val lat = row.getDouble(2)
        var i = 0
        while (i < qs.length) {
          val dx = lon - qs(i).lon; val dy = lat - qs(i).lat
          val d2 = dx * dx + dy * dy
          val h = heaps(i)
          if (h.size < kk) h.enqueue((d2, pid))
          else if (ord.lt((d2, pid), h.head)) { h.dequeue(); h.enqueue((d2, pid)) }
          i += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
        h.iterator.map { case (d2, pid) => (qs(i).qid, pid, d2) }
      }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaDouble)).collect()
    partial.groupBy(_._1).iterator.flatMap { case (_, xs) =>
      xs.sortBy(x => (x._3, x._2)).take(kk)
    }.toArray
  }
}
