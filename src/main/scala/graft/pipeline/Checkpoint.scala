package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.{ImageSynth, Geotag}
import graft.index.Hex

/** Resumable per-partition checkpointing with lineage (north_rule): the cell
  * space is split into `buckets` by hex-cell hash; each bucket is processed
  * as its own Spark job whose output commits atomically via a manifest JSON
  * `(bucket, cellMin, cellMax, rowCount, phashDigest, validation metrics)`.
  * A rerun skips every bucket whose manifest exists — exactly-once without
  * Iceberg's snapshot machinery (SURVEY.md §7.4 #7). Bucket selection happens
  * on the cheap seed-derived geotag, so skipped buckets cost only arithmetic,
  * never pixel rendering.
  *
  * Mirrors the reference's `extraction.status` progress + error-counter file
  * (InteractionsBuilder.java:114-123,470-507) upgraded to machine-readable
  * per-partition manifests.
  */
object Checkpoint {

  final case class Manifest(bucket: Int, cellMin: Long, cellMax: Long,
                            rowCount: Long, phashDigest: Long,
                            nPixelsOk: Long, nCaptionsOk: Long)

  def bucketOf(seed: Long, hexRes: Int, buckets: Int): Int = {
    val (lon, lat) = Geotag.of(seed)
    val cell = Hex.latLngToCell(lat, lon, hexRes)
    (ImageSynth.mix(cell) & 0x7FFFFFFF).toInt % buckets
  }

  private def manifestPath(outDir: String, b: Int) = Paths.get(s"$outDir/_commits/bucket-$b.json")

  /** Recursive scratch-dir delete — the ONE definition (was copy-pasted in
    * five places across src/tools). Closes the walk stream and tolerates a
    * missing path. */
  def deleteRecursively(path: java.nio.file.Path): Unit =
    if (Files.exists(path)) {
      val walk = Files.walk(path)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } finally walk.close()
    }

  def committed(outDir: String, buckets: Int): Set[Int] =
    (0 until buckets).filter(b => Files.exists(manifestPath(outDir, b))).toSet

  /** Table-level snapshot (the Iceberg-snapshot analog): aggregates every
    * bucket manifest into one JSON carrying total lineage — written only when
    * ALL buckets are committed, so its presence certifies a complete,
    * validated table. */
  def writeSnapshot(outDir: String, buckets: Int): Option[String] = {
    val done = committed(outDir, buckets)
    if (done.size != buckets) return None
    // real JSON parsing (Jackson ships with Spark) — the earlier regex field
    // scrape silently broke if a manifest field was ever reordered/reformatted
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val ms = (0 until buckets).map { b =>
      mapper.readTree(java.nio.file.Files.readString(manifestPath(outDir, b)))
    }
    def sumOf(field: String): Long = ms.map(_.get(field).asLong()).sum
    val json =
      s"""{"buckets":$buckets,"rowCount":${sumOf("rowCount")},
         |"phashDigest":${ms.map(_.get("phashDigest").asLong()).reduce(_ ^ _)},
         |"nPixelsOk":${sumOf("nPixelsOk")},"nCaptionsOk":${sumOf("nCaptionsOk")},
         |"manifests":[${(0 until buckets).map(b => s"\"_commits/bucket-$b.json\"").mkString(",")}]}"""
        .stripMargin.replace("\n", "")
    val tmp = Paths.get(s"$outDir/.snapshot.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(s"$outDir/snapshot.json"), StandardCopyOption.ATOMIC_MOVE)
    Some(json)
  }

  /** Gate shape for the checkpoint lineage manifests (S9, the north_rule's
    * "resumable from per-partition checkpoints recording lineage"): run a
    * FULL checkpointed build into a fresh scratch dir — synthesis, bucketed
    * write, re-read, validation, manifest commit — then emit each bucket's
    * manifest as a row. The DuckDB oracle re-derives the bucket assignment
    * (geotag → hex cell → splitmix hash) and the per-bucket cellMin/cellMax/
    * rowCount lineage analytically, with the hex-grid constants inlined from
    * the Scala side for FP bit-parity; a hash match proves the committed
    * manifests describe exactly the rows the partitioner should have routed.
    * The pixel-derived phashDigest stays OUT of the gate row (DuckDB cannot
    * re-render; it is spec-verified in CheckpointSpec), while the validation
    * counters assert all written rows decoded clean per bucket. */
  def lineageGate(spark: SparkSession, n: Long, buckets: Int = 8,
                  parts: Int = 8): DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ckpt_gate")
    // the manifests are driver-side values once run() returns — the scratch
    // build (parquet + commits) is deleted before the gate row-set is built,
    // so repeated bench/gate invocations cannot accumulate tmp data
    val ms = try run(spark, n, dir.toString, buckets, parts)
             finally deleteRecursively(dir)
    ms.map(m => (m.bucket, m.cellMin, m.cellMax, m.rowCount, m.nPixelsOk, m.nCaptionsOk))
      .toDF("bucket", "cell_min", "cell_max", "row_count", "n_pixels_ok", "n_captions_ok")
  }

  /** Diagnostic: id-range rows scanned by the LAST run's synthesis pass —
    * the spec asserts the range is scanned ONCE regardless of bucket count
    * (the round-1 design re-filtered the full range once per bucket). */
  @volatile var lastRangeEvals: Long = -1L

  /** Process all uncommitted buckets; optionally stop after `maxBuckets`
    * (the kill-after-K test hook).
    *
    * ONE synthesis pass: every id is bucket-assigned from its seed
    * (arithmetic only — skipped ids never render pixels), uncommitted
    * buckets render and write in a single `partitionBy("bucket")` job with
    * dynamic partition overwrite (committed buckets' files are untouched).
    * Manifests then derive per bucket from the WRITTEN files — proving the
    * committed bytes — and commit atomically (tmp + rename). */
  def run(spark: SparkSession, n: Long, outDir: String, buckets: Int = 8,
          parts: Int = 32, hexRes: Int = 7, maxBuckets: Int = Int.MaxValue): Seq[Manifest] = {
    import spark.implicits._
    Files.createDirectories(Paths.get(s"$outDir/_commits"))
    val done = committed(outDir, buckets)
    val todo = (0 until buckets).filterNot(done.contains).take(maxBuckets)
    if (todo.isEmpty) { return Seq.empty }
    val res = hexRes; val nb = buckets
    val bcTodo = spark.sparkContext.broadcast(todo.toSet)
    val evals = spark.sparkContext.longAccumulator("graft.ckpt.rangeEvals")

    val rows = spark.range(0L, n, 1L, parts).mapPartitions { it =>
      val t = bcTodo.value
      it.flatMap { i =>
        evals.add(1L)
        val b = bucketOf(ImageSynth.seedOf(i), res, nb) // arithmetic-only skip
        if (!t.contains(b)) None
        else {
          val r = ImageSynth.rowOf(i)
          Some((b, r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
        }
      }
    }.toDF("bucket", "image_id", "bytes", "w", "h", "fmt", "caption", "phash")

    // per-write option, NOT a session-conf mutation: concurrent writers in
    // the same session must not race into static-overwrite semantics
    rows.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s"$outDir/data")
    lastRangeEvals = evals.value

    todo.map { b =>
      val dataPath = s"$outDir/data/bucket=$b"

      // zero-row bucket (possible when n is small vs buckets): partitionBy
      // creates no directory — commit an empty manifest with sentinel lineage.
      // Existence resolves through the Hadoop FileSystem of the path (works
      // on HDFS/S3 outDirs, unlike a java.nio check)
      val hPath = new org.apache.hadoop.fs.Path(dataPath)
      val dataExists = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hPath)
      val m = if (!dataExists)
        Manifest(b, Long.MaxValue, Long.MinValue, 0L, 0L, 0L, 0L)
      else {
        // lineage + validation metrics from what was just written (re-read →
        // proves the committed bytes, not the in-flight ones)
        val written = spark.read.parquet(dataPath)
        val v = Validate.verdicts(written).toDF()
        val feats = ImagePipeline.featuresFromTable(written, hexRes = res)
        val stats = feats.agg(
          min(col("hex")).as("cellMin"), max(col("hex")).as("cellMax"),
          count(lit(1)).as("rowCount"),
          // order-independent digest: xor of phashes
          expr("bit_xor(phash)").as("phashDigest")
        ).head()
        val vstats = v.agg(
          sum(when(col("pixels_ok"), 1L).otherwise(0L)),
          sum(when(col("caption_ok"), 1L).otherwise(0L))).head()
        if (stats.isNullAt(0))
          Manifest(b, Long.MaxValue, Long.MinValue, 0L, 0L, 0L, 0L)
        else Manifest(b, stats.getLong(0), stats.getLong(1), stats.getLong(2),
          stats.getLong(3), if (vstats.isNullAt(0)) 0L else vstats.getLong(0),
          if (vstats.isNullAt(1)) 0L else vstats.getLong(1))
      }
      val json =
        s"""{"bucket":${m.bucket},"cellMin":${m.cellMin},"cellMax":${m.cellMax},
           |"rowCount":${m.rowCount},"phashDigest":${m.phashDigest},
           |"nPixelsOk":${m.nPixelsOk},"nCaptionsOk":${m.nCaptionsOk}}""".stripMargin.replace("\n", "")
      val tmp = Paths.get(s"$outDir/_commits/.bucket-$b.json.tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, manifestPath(outDir, b), StandardCopyOption.ATOMIC_MOVE)
      m
    }
  }
}
