package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Checkpoint
import graft.spatial.TileAssign
import graft.pipeline.ImagePipeline
import graft.index.Quadkey

class CheckpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rmrf(d: String): Unit = {
    val p = java.nio.file.Paths.get(d)
    Checkpoint.deleteRecursively(p)
  }

  test("kill-after-K resume: identical manifests, no double counting") {
    val dirA = "/tmp/ckpt_spec_resume"; val dirB = "/tmp/ckpt_spec_fresh"
    rmrf(dirA); rmrf(dirB)
    val n = 600L; val buckets = 4
    val r1 = Checkpoint.run(spark, n, dirA, buckets, parts = 4, maxBuckets = 2)
    assert(r1.size == 2)
    // one-pass write: the id range is scanned ONCE per run, not once per bucket
    assert(Checkpoint.lastRangeEvals == n, s"range scanned ${Checkpoint.lastRangeEvals} times for n=$n")
    val r2 = Checkpoint.run(spark, n, dirA, buckets, parts = 4)
    assert(r2.size == 2)
    assert(Checkpoint.lastRangeEvals == n)
    assert(Checkpoint.run(spark, n, dirA, buckets, parts = 4).isEmpty) // no-op
    val fresh = Checkpoint.run(spark, n, dirB, buckets, parts = 4)
    assert(fresh.size == buckets)
    assert(Checkpoint.lastRangeEvals == n)
    val a = (r1 ++ r2).map(m => m.bucket -> (m.rowCount, m.phashDigest)).toMap
    val b = fresh.map(m => m.bucket -> (m.rowCount, m.phashDigest)).toMap
    assert(a == b)
    assert(a.values.map(_._1).sum == n)
    // every committed bucket also passed validation
    (r1 ++ r2).foreach { m =>
      assert(m.nPixelsOk == m.rowCount && m.nCaptionsOk == m.rowCount, m.toString)
    }
  }

  test("append: two incremental epoch runs == one-shot batch over the union") {
    val dirI = "/tmp/ckpt_spec_incr"; val dirO = "/tmp/ckpt_spec_oneshot"
    rmrf(dirI); rmrf(dirO)
    val n0 = 400L; val n1 = 600L; val buckets = 4
    // epoch 0 commits, then the input GROWS: epoch 1 arrives
    val e0 = Checkpoint.runEpoch(spark, 0, 0L, n0, dirI, buckets, parts = 4)
    val e1 = Checkpoint.runEpoch(spark, 1, n0, n1, dirI, buckets, parts = 4)
    assert(e0.size == buckets && e1.size == buckets)
    // idempotence: re-running either epoch is a no-op
    assert(Checkpoint.runEpoch(spark, 0, 0L, n0, dirI, buckets, parts = 4).isEmpty)
    assert(Checkpoint.runEpoch(spark, 1, n0, n1, dirI, buckets, parts = 4).isEmpty)
    // the round-4 failure mode this design closes: appended rows landing in
    // already-committed buckets were silently dropped. Per-bucket lineage of
    // the two epochs must compose to the one-shot batch: rowCounts add, phash
    // digests xor (xor is associative and order-free over the same row set)
    val oneShot = Checkpoint.runEpoch(spark, 0, 0L, n1, dirO, buckets, parts = 4)
    val incr = (e0 ++ e1).groupBy(_.bucket).map { case (b, ms) =>
      b -> (ms.map(_.rowCount).sum, ms.map(_.phashDigest).reduce(_ ^ _))
    }
    val one = oneShot.map(m => m.bucket -> (m.rowCount, m.phashDigest)).toMap
    assert(incr == one, s"incremental $incr != one-shot $one")
    assert(incr.values.map(_._1).sum == n1)
    // and the committed BYTES agree: the union of both epochs' data files
    // holds exactly the one-shot row set
    val rowsI = spark.read.parquet(s"$dirI/data")
      .select("image_id", "phash").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rowsO = spark.read.parquet(s"$dirO/data")
      .select("image_id", "phash").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rowsI == rowsO && rowsI.size == n1)
    // epoch-scoped snapshot covers both epochs
    val snap = Checkpoint.writeSnapshot(dirI, buckets, epochs = 2)
    assert(snap.isDefined && snap.get.contains("\"rowCount\":600"))
  }

  test("Trigger.AvailableNow over the epoch layout ingests exactly the newly appended epoch") {
    val dir = "/tmp/ckpt_spec_stream"; val ck = "/tmp/ckpt_spec_stream_ck"
    rmrf(dir); rmrf(ck)
    Checkpoint.runEpoch(spark, 0, 0L, 300L, dir, buckets = 4, parts = 4)
    def runOnce(): (Map[Int, Long], Long) = {
      val q = Checkpoint.epochStream(spark, dir)
        .groupBy(col("epoch")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("epoch_counts")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val read = q.recentProgress.map(_.numInputRows).sum
      (spark.table("epoch_counts").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap, read)
    }
    val (c1, in1) = runOnce()
    assert(c1 == Map(0 -> 300L) && in1 == 300L)
    // the input GROWS: epoch 1 commits through the batch ingest path
    Checkpoint.runEpoch(spark, 1, 300L, 500L, dir, buckets = 4, parts = 4)
    val (c2, in2) = runOnce()
    // cumulative state is correct AND only the new epoch's files were read
    assert(c2 == Map(0 -> 300L, 1 -> 200L), s"got $c2")
    assert(in2 == 200L, s"second run re-read old files: $in2 input rows")
  }

  test("manifest derivation is ONE grouped action, not a per-bucket driver loop") {
    val dir = "/tmp/ckpt_spec_onejob"
    rmrf(dir)
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    durationNs: Long): Unit = names.add(funcName)
      def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    exception: Exception): Unit = names.add("FAIL:" + funcName)
    }
    spark.listenerManager.register(listener)
    try {
      Checkpoint.run(spark, 600L, dir, buckets = 6, parts = 4)
      var last = -1; var stable = 0; var waited = 0
      while (stable < 4 && waited < 5000) {
        Thread.sleep(50); waited += 50
        val cur = names.size()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val evs = names.toArray(Array.empty[String]).toSeq
      // exactly one write action + ONE stats collect for all 6 buckets; the
      // round-4 shape issued 2 head() actions per bucket (12 extra events)
      assert(evs.count(_ == "collect") == 1,
        s"expected ONE grouped stats action, saw $evs")
      assert(evs.size <= 2, s"expected write + 1 stats action, saw $evs")
    } finally spark.listenerManager.unregister(listener)
  }
}

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted repartition flattens the metro hot cells") {
    import org.apache.spark.sql.Row
    val feats = ImagePipeline.fastFeatures(spark, 6000, 4)
      .withColumn("z8", graft.index.Quadkey.cellIdCol(col("lon"), col("lat"), 8))
    def maxPartitionFraction(df: org.apache.spark.sql.DataFrame): Double = {
      val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
      sizes.max.toDouble / sizes.sum
    }
    val unsalted = feats.repartition(16, col("z8"))
    val salted = TileAssign.repartitionByCellSalted(feats, "z8", 16, salt = 8)
    val uf = maxPartitionFraction(unsalted)
    val sf = maxPartitionFraction(salted)
    // 70% of rows sit in 3 metros → hashing whole cells leaves a hot
    // partition; salting must spread it close to uniform (1/16 = 0.0625)
    assert(sf < uf, s"salted=$sf unsalted=$uf")
    assert(sf < 0.15, s"salted max-partition fraction $sf")
  }

  test("multi-zoom cells agree with direct encoding at every zoom") {
    val zooms = Seq(8, 10, 12)
    val out = TileAssign.withTileMultiZoom(
      ImagePipeline.fastFeatures(spark, 300, 2), "lon", "lat", zooms).collect()
    assert(out.length == 300 * zooms.size)
    out.foreach { r =>
      val lon = r.getAs[Double]("lon"); val lat = r.getAs[Double]("lat")
      val z = r.getAs[Int]("zoom"); val cell = r.getAs[Long]("cell_id")
      assert(cell == Quadkey.cellIdOf(lon, lat, z), s"z=$z ($lon,$lat)")
    }
  }
}

class StoredTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stored-table pipeline: bytes column pruned from the scan, results match fast path") {
    val dir = "/tmp/stored_table_spec"
    val p = java.nio.file.Paths.get(dir)
    Checkpoint.deleteRecursively(p)
    ImagePipeline.synthTable(spark, 800, 4).write.parquet(dir)

    val stored = spark.read.parquet(dir)
    val feats = ImagePipeline.featuresFromTable(stored)
    // THE column-pruning claim: the 100TB of pixels must stay at the scan
    val plan = feats.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(plan).map(_.group(1))
      .getOrElse(plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(""))
    assert(!plan.contains("bytes:binary") || readSchema.isEmpty ||
      !readSchema.contains("bytes"), s"bytes not pruned: $plan")

    val viaTable = ImagePipeline.tileTeamPivot(
      ImagePipeline.pipJoin(feats, ImagePipeline.metroBoundaries)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(6))).toSet
    val viaFast = ImagePipeline.run(spark, 800, 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(6))).toSet
    assert(viaTable == viaFast)
  }

  test("snapshot.json appears only when every bucket is committed") {
    val dir = "/tmp/ckpt_snapshot_spec"
    val p = java.nio.file.Paths.get(dir)
    Checkpoint.deleteRecursively(p)
    Checkpoint.run(spark, 400L, dir, 4, parts = 4, maxBuckets = 2)
    assert(Checkpoint.writeSnapshot(dir, 4).isEmpty) // incomplete -> no snapshot
    Checkpoint.run(spark, 400L, dir, 4, parts = 4)
    val snap = Checkpoint.writeSnapshot(dir, 4)
    assert(snap.isDefined)
    assert(snap.get.contains("\"rowCount\":400"))
    assert(snap.get.contains("\"nPixelsOk\":400"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/snapshot.json")))
  }
}
