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
