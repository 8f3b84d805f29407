package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Ev
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(day: Int, h: Int = 0): Timestamp =
    new Timestamp((day.toLong * 86400L + h * 3600L) * 1000L)

  test("daily tumbling window with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.dailyCounts(mem.toDF()).writeStream
      .format("memory").queryName("daily_counts").outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts(19000, 1), "click"), Ev(2, ts(19000, 5), "view"), Ev(1, ts(19000, 9), "click"),
        Ev(3, ts(19001, 2), "view"))
      q.processAllAvailable()
      // advance the watermark far enough to close day 19000 and 19001
      mem.addData(Ev(9, ts(19005, 0), "click"))
      q.processAllAvailable()
      val rows = spark.table("daily_counts").collect()
        .map(r => (r.getTimestamp(0).getTime / 86400000L, r.getLong(1))).toMap
      assert(rows.get(19000L).contains(3L))
      assert(rows.get(19001L).contains(1L))
    } finally q.stop()
  }

  test("streaming tile rollup: per-(day, z12 cell) counts; late data past the watermark is DROPPED") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double, Double)]
    val feats = mem.toDF().toDF("user_id", "ts", "lon", "lat")
    val q = EventStream.tileRollupStream(feats).writeStream
      .format("memory").queryName("tile_stream").outputMode("append").start()
    try {
      val (sfLon, sfLat) = (-122.42, 37.77)
      val (paLon, paLat) = (2.35, 48.86)
      mem.addData((1L, ts(19000, 1), sfLon, sfLat), (2L, ts(19000, 2), sfLon, sfLat),
        (3L, ts(19000, 3), paLon, paLat))
      q.processAllAvailable()
      // watermark forward: event 3 days later closes day 19000's windows
      mem.addData((9L, ts(19003, 0), sfLon, sfLat))
      q.processAllAvailable()
      // LATE arrival for the closed day — must be dropped, not re-emitted
      mem.addData((4L, ts(19000, 5), sfLon, sfLat))
      q.processAllAvailable()
      mem.addData((9L, ts(19006, 0), sfLon, sfLat))
      q.processAllAvailable()
      val sfTile = graft.index.Quadkey.cellIdOf(sfLon, sfLat, 12)
      val paTile = graft.index.Quadkey.cellIdOf(paLon, paLat, 12)
      val rows = spark.table("tile_stream").collect()
        .map(r => (r.getTimestamp(0).getTime / 86400000L, r.getLong(1)) -> r.getLong(2)).toMap
      assert(rows.get((19000L, sfTile)).contains(2L), s"sf day counts: $rows")
      assert(rows.get((19000L, paTile)).contains(1L))
      // the late row (user 4) did NOT bump the closed window
      assert(!rows.exists { case ((d, t), n) => d == 19000L && t == sfTile && n != 2L })
    } finally q.stop()
  }

  test("stateful minor-version counter via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.minorVersionCounter(mem.toDS()).writeStream
      .format("memory").queryName("mv_stream").outputMode("append").start()
    try {
      mem.addData(Ev(1, ts(19000, 1), "click"), Ev(1, ts(19000, 2), "view"))
      q.processAllAvailable()
      mem.addData(Ev(1, ts(19000, 3), "signup"), Ev(1, ts(19000, 4), "click"))
      q.processAllAvailable()
      val rows = spark.table("mv_stream").collect()
        .map(r => (r.getTimestamp(1).getTime / 3600000L % 24, r.getInt(2))).toMap
      // click(1), view(2) -> mv 1,2 ; signup -> 0 (reset); click -> 1 (state carried across batches)
      assert(rows == Map(1L -> 1, 2L -> 2, 3L -> 0, 4L -> 1))
    } finally q.stop()
  }
}

class SafeRowsSpec extends AnyFunSuite {
  import graft.ops.SafeRows
  lazy val spark = TestSpark.spark

  test("per-row quarantine: bad rows counted and isolated, good rows survive") {
    import spark.implicits._
    val ds = spark.createDataset(Seq("1", "2", "oops", "4", "bad"))
    val counters = new SafeRows.ErrorCounters(spark, Seq("NumberFormatException", "OTHER"))
    val tagged = SafeRows.map[String, Long](ds, _.toLong, identity, counters).cache()
    val good = SafeRows.ok(tagged).collect().sorted
    val bad = SafeRows.quarantined(tagged).collect()
    assert(good.toSeq == Seq(1L, 2L, 4L))
    assert(bad.map(_.key).sorted.toSeq == Seq("bad", "oops"))
    assert(bad.forall(_.errorClass == "NumberFormatException"))
    assert(counters.snapshot("NumberFormatException") == 2L)
    tagged.unpersist()
  }

  test("corrupted image bytes quarantine instead of failing the job") {
    import spark.implicits._
    val rows = graft.pipeline.ImagePipeline.synthTable(spark, 20, 2).collect().toSeq
    val corrupted = rows.updated(3, rows(3).copy(bytes = Array[Byte](1, 2, 3)))
    val ds = spark.createDataset(corrupted.map(r => (r.image_id, r.bytes)))
    val counters = new SafeRows.ErrorCounters(spark, Seq("NullPointerException", "OTHER"))
    val decode: ((String, Array[Byte])) => Int = { case (_, bytes) =>
      // ImageIO.read returns null on garbage; getWidth then NPEs — the
      // classic partial-corruption failure mode the reference counts
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)).getWidth
    }
    val tagged = SafeRows.map(ds, decode, (t: (String, Array[Byte])) => t._1, counters).cache()
    assert(SafeRows.ok(tagged).count() == 19)
    val bad = SafeRows.quarantined(tagged).collect()
    assert(bad.length == 1 && bad.head.key == corrupted(3).image_id)
    assert(counters.snapshot.values.sum == 1L)
    tagged.unpersist()
  }
}
