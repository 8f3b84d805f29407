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
  def bruteTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10): DataFrame =
    bruteTopKOver(spark, loadVecs(spark, dir), queriesFrom(spark, dir, q), k)

  /** Metadata-FILTERED vector search — top-k restricted to candidates
    * matching a structured predicate (the `label` column), the filtered-ANN
    * shape every retrieval stack needs (filter-then-search; post-filtering a
    * top-k can return < k or nothing when the filter is selective). The
    * predicate is applied BEFORE the scoring scan, so it reaches the parquet
    * scan as a PushedFilter and non-qualifying row groups never decode —
    * at 10^12 vectors with a partition-aligned label this is partition
    * pruning, not just row skipping. Same exact kernel as [[bruteTopK]]. */
  def filteredTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10,
                   label: Int = 3): DataFrame = {
    val cands = table(spark, dir, "embeddings")
      .filter(col("label") === label)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    bruteTopKOver(spark, cands, queriesFrom(spark, dir, q), k)
  }

  private def bruteTopKOver(spark: SparkSession, vecs: DataFrame,
                            queries: Seq[EmbQuery], k: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(queries.toArray)
    val kk = k
    val partial = vecs.mapPartitions { it =>
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
    * FP-stable).
    *
    * Execution shape (the round-2 version was a single-task all-pairs
    * BroadcastNestedLoopJoin with its cosine UDF re-evaluated inside the join
    * condition — both an O(N) broadcast and an O(N²) single thread): vectors
    * are assigned to `blocks` disjoint blocks by id; every unordered block
    * pair (i ≤ j) becomes one group of a groupByKey, so the pair space runs
    * across blocks·(blocks+1)/2 independent tasks. Each vector ships to
    * exactly `blocks` groups (O(N·√tasks) replication — the standard
    * distributed all-pairs triangle), the cosine kernel runs ONCE per pair
    * over primitive arrays with per-vector norms precomputed, and no UDF
    * appears in any join condition. Norms are sqrt of the same left-to-right
    * dot the oracle uses, so cos = dot/(na·nb) is FP-bit-identical to the
    * DuckDB all-pairs oracle.
    *
    * At 10^12 rows exact all-pairs is inherently Θ(N²) work — there `blocks`
    * is sized so a block fits executor memory and this same kernel becomes
    * the verification tier over [[cosineNearDupLshTier]] buckets (when the
    * threshold's angle gives LSH real recall; at θ=0.45 on this corpus the
    * qualifying pairs sit ON the threshold — measured min cos 0.4501 — so no
    * sketch prefilter has certifiable recall and the gate runs exact). */
  def cosineNearDupPairs(spark: SparkSession, dir: String, minCos: Double = 0.45,
                         blocks: Int = 8): DataFrame = {
    import spark.implicits._
    val b = blocks
    val thr = minCos
    val withNorm = loadVecs(spark, dir).as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) => (id, v, math.sqrt(dot(v, v))) })
    // triangle replication: a vector in block p is the "row" side of pairs
    // (p, j≥p) and the "column" side of pairs (i<p, p) — every unordered
    // block pair lands in exactly one group, every vector in `blocks` groups
    val keyed = withNorm.flatMap { case (id, v, n) =>
      val p = (id % b).toInt
      Iterator.range(p, b).map(j => (p * b + j, id, v, n)) ++
        Iterator.range(0, p).map(i => (i * b + p, id, v, n))
    }
    keyed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val bi = key / b; val bj = key % b
      val rows = new scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]
      val cols = new scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]
      it.foreach { case (_, id, v, n) =>
        val p = (id % b).toInt
        if (p == bi) rows += ((id, v, n))
        if (p == bj && bi != bj) cols += ((id, v, n))
      }
      val left = rows.toArray
      val right = if (bi == bj) left else cols.toArray
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]
      var x = 0
      while (x < left.length) {
        val (ida, va, na) = left(x)
        var y = if (bi == bj) x + 1 else 0
        while (y < right.length) {
          val (idb, vb, nb) = right(y)
          val c = dot(va, vb) / (na * nb)
          if (c >= thr) {
            val lo = math.min(ida, idb); val hi = math.max(ida, idb)
            out += ((lo, hi, math.floor(c * 10000.0 + 0.5).toLong))
          }
          y += 1
        }
        x += 1
      }
      out.iterator
    }.toDF("a", "b", "cos_e4")
  }

  /** kNN-GRAPH construction — every vector's exact top-k neighbors, the
    * graph that clustering, SemDeDup-style analyses and graph-based ANN
    * indexes (HNSW/NSG) are built from. Same triangle block decomposition as
    * [[cosineNearDupPairs]] (each unordered block pair is one group, each
    * vector replicates to `blocks` groups), but instead of emitting
    * threshold pairs each group keeps PER-VECTOR bounded heaps for BOTH
    * sides and emits at most k candidates per vector per group — the
    * exchange after the quadratic is ≤ N·blocks·k rows, never N². A global
    * window reduces the per-group candidates to the true top-k (every
    * other vector is met exactly once across groups, so the union of group
    * heaps contains the global top-k). Cosine = dot/(‖a‖·‖b‖) with
    * per-vector norms computed once (the q44 kernel, replicated in the q77
    * oracle's all-pairs window). */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 4, blocks: Int = 8): DataFrame = {
    import spark.implicits._
    val b = blocks; val kk = k
    val withNorm = loadVecs(spark, dir).as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) => (id, v, math.sqrt(dot(v, v))) })
    val keyed = withNorm.flatMap { case (id, v, n) =>
      val p = (id % b).toInt
      Iterator.range(p, b).map(j => (p * b + j, id, v, n)) ++
        Iterator.range(0, p).map(i => (i * b + p, id, v, n))
    }
    val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
    val partial = keyed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val bi = key / b; val bj = key % b
      val rows = new scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]
      val cols = new scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]
      it.foreach { case (_, id, v, n) =>
        val p = (id % b).toInt
        if (p == bi) rows += ((id, v, n))
        if (p == bj && bi != bj) cols += ((id, v, n))
      }
      val left = rows.toArray
      val right = if (bi == bj) left else cols.toArray
      val heaps = new scala.collection.mutable.HashMap[
        Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]()
      def offer(id: Long, key: (Double, Long)): Unit = {
        val h = heaps.getOrElseUpdate(id,
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        if (h.size < kk) h.enqueue(key)
        else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
      }
      var x = 0
      while (x < left.length) {
        val (ida, va, na) = left(x)
        var y = if (bi == bj) x + 1 else 0
        while (y < right.length) {
          val (idb, vb, nb) = right(y)
          val c = dot(va, vb) / (na * nb)
          offer(ida, (-c, idb))
          offer(idb, (-c, ida))
          y += 1
        }
        x += 1
      }
      heaps.iterator.flatMap { case (id, h) =>
        h.iterator.map { case (nc, nbr) => (id, nbr, nc) }
      }
    }.toDF("vec_id", "nbr", "neg_cos")
    partial.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("neg_cos"), col("nbr"))))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("nbr"), col("rank"))
  }

  /** LSH-bucketed near-dup tier — the scale path of [[cosineNearDupPairs]]
    * for corpora where the threshold's angle gives LSH real recall. Band
    * geometry: 8 bands × 8 sign bits. Near-identical vectors (cos ≥ ~0.999,
    * the planted-dup regime) agree per bit w.p. 1 − θ/π ≈ 0.99, so an 8-bit
    * band collides w.p. ≈ 0.96 and missing all 8 bands is ~1e-12; while
    * RANDOM pairs (p_bit = 0.5) collide per band w.p. 2⁻⁸, so benign buckets
    * hold ~N/256 members per band and the hot-bucket cap engages only on
    * genuine dup pileups — the same selectivity contract as minhash bands
    * and simhash segments. (The round-3 geometry of 8 × 2-bit bands had only
    * FOUR buckets per band: every bucket was hot on any corpus over ~256
    * rows, so a finite default cap would have silently collapsed recall —
    * caught in round-4 review; with 8-bit bands the cap + recall coexist and
    * the planted-dup spec runs under PRODUCTION defaults.) Shape: band
    * bucketing emits candidate ID pairs only (no vectors in the exchange)
    * through the SAME hot-bucket bound as the minhash/simhash paths
    * ([[graft.text.Dedup.boundedPairs]]: a band bucket of m near-identical
    * vectors — exactly what this tier is FOR — otherwise self-joins into
    * m²/2 candidates; above `maxBucket` it degrades to O(m) dual-hub star
    * pairs), vectors join back once, and the exact-cosine verify runs in a
    * mapPartitions kernel over primitive arrays — cosine once per candidate,
    * never in a join condition. */
  def cosineNearDupLshTier(vecs: DataFrame, minCos: Double,
                           nBits: Int = 64, bands: Int = 8, dim: Int = 64,
                           maxBucket: Int = 64): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val planes = hyperplanes(nBits, dim)
    val bcP = spark.sparkContext.broadcast(planes)
    val bitsPerBand = nBits / bands
    val mask = (1L << bitsPerBand) - 1
    val sigUdf = udf { (v: Seq[Double]) => signature(v.toArray, bcP.value) }
    val banded = vecs.withColumn("sig", sigUdf(col("v")))
      .select(col("vec_id"), posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask))): _*)))
      .toDF("doc_id", "band", "bucket")
    val cand = graft.text.Dedup.boundedPairs(banded, maxBucket)
    // vectors join back exactly once per side; the verify kernel runs over
    // primitive arrays inside the partition
    val withVecs = cand
      .join(vecs.select(col("vec_id").as("a"), col("v").as("va")), Seq("a"))
      .join(vecs.select(col("vec_id").as("b"), col("v").as("vb")), Seq("b"))
      .select(col("a"), col("b"), col("va"), col("vb"))
      .as[(Long, Long, Array[Double], Array[Double])]
    val thr = minCos
    withVecs.mapPartitions { it =>
      it.flatMap { case (a, b, va, vb) =>
        val c = cosine(va, vb)
        if (c >= thr) Iterator.single((a, b, math.floor(c * 10000.0 + 0.5).toLong))
        else Iterator.empty
      }
    }.toDF("a", "b", "cos_e4")
  }

  /** Per-vector int8 scalar quantization (the SQ8 memory tier): 64 doubles
    * (512 B) become 64 bytes + 2 doubles — ~7× smaller resident index, the
    * standard first memory lever before IVF/PQ at 10^12 vectors. The code
    * for component x is `floor((x − lo)·255/(hi − lo) + 0.5)` (floor(+0.5),
    * never Math.round/SQL round, whose half-even ties differ across
    * engines); reconstruction is `lo + code·step`, step = (hi−lo)/255.
    * Every op is replicated in the q66 oracle, so scores are FP-bit
    * comparable. */
  def sqQuantize(v: Array[Double]): (Double, Double, Array[Byte]) = {
    var lo = v(0); var hi = v(0); var i = 1
    while (i < v.length) { if (v(i) < lo) lo = v(i); if (v(i) > hi) hi = v(i); i += 1 }
    val codes = new Array[Byte](v.length)
    if (hi > lo) {
      i = 0
      while (i < v.length) {
        codes(i) = (math.floor((v(i) - lo) * 255.0 / (hi - lo) + 0.5).toInt - 128).toByte
        i += 1
      }
    } else java.util.Arrays.fill(codes, (-128).toByte) // constant vector: all code 0
    (lo, (hi - lo) / 255.0, codes)
  }

  /** Exhaustive top-k over the QUANTIZED index — queries stay full
    * precision, every stored vector is scored through its int8
    * reconstruction (`lo + code·step`), cosine built from the same
    * left-to-right loops as [[bruteTopK]]. Shape: quantization happens in
    * the partition that read the vector (in production the SQ index is what
    * persists — bytes, not doubles), scoring is per-partition bounded heaps,
    * only Q·k candidate rows shuffle. The q66 gate replays quantization +
    * reconstruction + scoring in DuckDB, so rank-for-rank agreement proves
    * the whole tier; AnnSpec separately pins recall@k against the
    * full-precision brute answer (quantization loses information — the
    * RECALL is the honest quality metric, the gate pins the mechanics). */
  def sqTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10): DataFrame = {
    import spark.implicits._
    val queries = queriesFrom(spark, dir, q)
    val bc = spark.sparkContext.broadcast(queries.toArray)
    val kk = k
    val partial = loadVecs(spark, dir).as[(Long, Array[Double])].mapPartitions { it =>
      val qs = bc.value
      val qn = qs.map(qq => math.sqrt(dot(qq.vec, qq.vec)))
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
      it.foreach { case (id, v) =>
        val (lo, step, codes) = sqQuantize(v)
        var qi = 0
        while (qi < qs.length) {
          val qv = qs(qi).vec
          var s = 0.0; var rr = 0.0; var i = 0
          while (i < codes.length) {
            val r = lo + (codes(i) + 128).toDouble * step
            s += qv(i) * r; rr += r * r
            i += 1
          }
          val c = s / (qn(qi) * math.sqrt(rr))
          val key = (-c, id)
          val h = heaps(qi)
          if (h.size < kk) h.enqueue(key)
          else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
          qi += 1
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

  /** IVF routing composed over the SQ8 index — the standard two-lever memory
    * tier at 10^12 vectors (FAISS's `IVFx,SQ8` family): the coarse quantizer
    * routes each query to `nprobe` inverted lists, and list members are
    * scored through their int8 reconstruction instead of full-precision
    * doubles, so the resident index is codes + (lo, step) per vector and the
    * centroid table. Routing stays full precision (it runs once per stored
    * vector at build time and once per query at search time — quantizing the
    * ROUTER saves nothing and shifts list boundaries); only the SCORING uses
    * codes. The per-pair arithmetic is the exact [[sqTopK]] kernel
    * (quantize → `lo + code·step` → left-to-right dot), so `nprobe == nlist`
    * degenerates to exhaustive SQ8 search and must equal [[sqTopK]] — which
    * is how the q69 gate pins it (q66's replica oracle, reused verbatim);
    * AnnSparkSpec separately pins partial-probe recall on planted clusters
    * and full-probe equality to sqTopK. */
  def ivfSqTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10,
                nlist: Int = 16, nprobe: Int = 16, iters: Int = 2): DataFrame =
    ivfSqTopKFrom(loadVecs(spark, dir), queriesFrom(spark, dir, q), k, nlist, nprobe, iters)

  def ivfSqTopKFrom(vecs: DataFrame, queries: Seq[EmbQuery], k: Int,
                    nlist: Int, nprobe: Int, iters: Int = 2): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(vecs, nlist, iters)
    val probes: Map[Long, Array[Int]] = queries.map { qq =>
      qq.qid -> cents.indices
        .sortBy(ci => (-cosine(cents(ci), qq.vec), ci)).take(nprobe).toArray
    }.toMap
    val bcC = spark.sparkContext.broadcast(cents)
    val bcQ = spark.sparkContext.broadcast(queries.toArray)
    val bcProbes = spark.sparkContext.broadcast(probes)
    val kk = k
    // one scan: assign the list (full-precision router), quantize once,
    // score through the reconstruction for every query probing that list —
    // vectors never shuffle, only Q·k heap survivors per partition do
    val partial = vecs.as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bcC.value; val qs = bcQ.value; val pr = bcProbes.value
      val qn = qs.map(qq => math.sqrt(dot(qq.vec, qq.vec)))
      val probed = qs.map(qq => pr(qq.qid))
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
      it.foreach { case (id, v) =>
        var best = 0; var bestC = Double.NegativeInfinity
        var ci = 0
        while (ci < cs.length) {
          val c = cosine(cs(ci), v)
          if (c > bestC) { bestC = c; best = ci }
          ci += 1
        }
        var quant: (Double, Double, Array[Byte]) = null
        var qi = 0
        while (qi < qs.length) {
          if (probed(qi).contains(best)) {
            if (quant == null) quant = sqQuantize(v)
            val (lo, step, codes) = quant
            val qv = qs(qi).vec
            var s = 0.0; var rr = 0.0; var i = 0
            while (i < codes.length) {
              val r = lo + (codes(i) + 128).toDouble * step
              s += qv(i) * r; rr += r * r
              i += 1
            }
            val c = s / (qn(qi) * math.sqrt(rr))
            val key = (-c, id)
            val h = heaps(qi)
            if (h.size < kk) h.enqueue(key)
            else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
          }
          qi += 1
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

  /** Deterministic planted near-dup corpus for gating the LSH tier: ids
    * group in runs of `groupSize`; members of a group share a splitmix-drawn
    * base vector plus a per-member eps-scaled perturbation, so within-group
    * cosines sit at ~0.9999 (≥ any dedup threshold) while cross-group
    * cosines are those of independent 64-dim uniform vectors (|cos| rarely
    * above ~0.5) — a corpus where LSH at θ=0.95 has CERTIFIABLE recall,
    * unlike the embeddings table whose qualifying pairs hug the threshold
    * (Ann.cosineNearDupPairs doc). Every arithmetic step (splitmix64, the
    * top-53-bit uniform, base + eps·noise) is replicated operation-for-
    * operation in the DuckDB oracle (OracleSql.q65), so the gate hashes the
    * tier's full output relation. */
  def plantedNearDupVecs(spark: SparkSession, n: Int, dim: Int = 64,
                         groupSize: Int = 3, eps: Double = 0.01): DataFrame = {
    import spark.implicits._
    val d = dim; val gs = groupSize; val e = eps
    spark.range(0L, n.toLong, 1L, 8).map { idx =>
      val g = idx / gs
      val v = Array.tabulate(d) { i =>
        val b = unitUniform(graft.synth.ImageSynth.mix(g * d + i + 10000000L))
        val nz = unitUniform(graft.synth.ImageSynth.mix(idx * d + i + 20000000L))
        b + e * nz
      }
      (idx, v)
    }.toDF("vec_id", "v")
  }

  /** Uniform in [-1, 1) from the top 53 bits of a 64-bit hash (the
    * hyperplanes construction, shared with the q65 corpus). */
  private def unitUniform(h: Long): Double =
    (h >>> 11).toDouble / (1L << 52).toDouble - 1.0

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path the brief
    * names alongside LSH: deterministic Lloyd-refined centroids over
    * normalized vectors, every vector assigned to its nearest-by-cosine
    * centroid (the inverted list = a partition key at 10^12 rows), queries
    * probe the `nprobe` nearest lists and exact-rerank only those lists'
    * members. `nprobe == nlist` degenerates to exhaustive search and must
    * equal [[bruteTopK]] exactly (asserted in AnnSparkSpec). */
  def ivfTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame =
    ivfTopKFrom(loadVecs(spark, dir), queriesFrom(spark, dir, q), k, nlist, nprobe, iters)

  def ivfTopKFrom(vecs: DataFrame, queries: Seq[EmbQuery], k: Int,
                  nlist: Int, nprobe: Int, iters: Int = 2): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(vecs, nlist, iters)
    val bcC = spark.sparkContext.broadcast(cents)
    // probe sets per query: nprobe centroids nearest by cosine
    val probes: Map[Long, Array[Int]] = queries.map { qq =>
      qq.qid -> cents.indices
        .sortBy(ci => (-cosine(cents(ci), qq.vec), ci)).take(nprobe).toArray
    }.toMap
    val bcQ = spark.sparkContext.broadcast(queries.map(qq => qq.qid -> qq.vec).toMap)
    val bcProbes = spark.sparkContext.broadcast(probes)
    // one scan: assign list, emit (qid, vec_id, cos) for probed members only;
    // vectors never shuffle — only the Q·|probed| candidate rows do
    val scored = vecs.as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bcC.value; val qs = bcQ.value; val pr = bcProbes.value
      it.flatMap { case (id, v) =>
        var best = 0; var bestC = Double.NegativeInfinity
        var ci = 0
        while (ci < cs.length) {
          val c = cosine(cs(ci), v)
          if (c > bestC) { bestC = c; best = ci }
          ci += 1
        }
        pr.iterator.collect {
          case (qid, lists) if lists.contains(best) => (qid, id, cosine(qs(qid), v))
        }
      }
    }.toDF("qid", "vec_id", "cos")
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"))
  }

  /** Deterministic IVF centroids: seeded from the `nlist` lowest vec_ids,
    * refined with `iters` Lloyd steps (assignment in mapPartitions over the
    * broadcast centroids; vectors are read, never shuffled: only the
    * nlist·parts (list, partitionId, sumVec, n) partials move — straight to
    * the driver, no shuffle stage at all). The cross-partition reduction is
    * ORDER-PINNED: partials carry their partition ordinal and the driver sums
    * them sorted by (list, partition), so the FP result — and hence list
    * assignment and any nprobe<nlist answer — is identical run to run
    * (a collect_list-based reduction was not: its element order is
    * nondeterministic and double addition does not commute in FP). */
  def ivfCentroids(vecs: DataFrame, nlist: Int, iters: Int): Array[Array[Double]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var cents: Array[Array[Double]] = vecs.orderBy(col("vec_id")).limit(nlist)
      .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
    val dim = cents.head.length
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = vecs.as[(Long, Array[Double])].mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val cs = bc.value
        val sums = Array.fill(cs.length)(new Array[Double](cs.head.length))
        val counts = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          var best = 0; var bestC = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val c = cosine(cs(ci), v)
            if (c > bestC) { bestC = c; best = ci }
            ci += 1
          }
          var i = 0
          while (i < v.length) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        sums.iterator.zipWithIndex.collect {
          case (s, ci) if counts(ci) > 0 => (ci, pid, s, counts(ci))
        }
      }.collect()
      val next = cents.map(_.clone())
      partials.groupBy(_._1).foreach { case (ci, ps) =>
        val acc = new Array[Double](dim)
        var n = 0L
        ps.sortBy(_._2).foreach { case (_, _, s, c) =>
          var i = 0
          while (i < dim) { acc(i) += s(i); i += 1 }
          n += c
        }
        next(ci) = acc.map(_ / n)
      }
      cents = next
    }
    cents
  }

  /** Product quantization (Jégou et al. 2011) over the INTEGER LATTICE —
    * the third memory tier after SQ8 and IVF+SQ8: each vector stores only
    * `m` sub-codebook indices (m=8, ksub=16 → 4 bytes vs 512, a 128×
    * smaller resident index). The twist that makes it verifiable AND
    * cluster-stable: codebooks are trained by Lloyd's algorithm on the
    * e6-QUANTIZED integer lattice (`floor(x·1e6 + 0.5)`), so every training
    * sum is exact 64-bit integer arithmetic — merge-order-free, hence
    * bit-identical at ANY partitioning/parallelism (FP k-means is not: its
    * centroid sums depend on partition boundaries, which is why q55's IVF
    * had to pin a driver-side reduction order), and exactly replayable by
    * the q75 DuckDB oracle (assignment = integer argmin with the
    * `D·ksub + j` tie-encoding, update = floor-div centroid means, empty
    * clusters keep their centroid). Scoring reconstructs the 64-dim vector
    * from the broadcast codebooks and applies the exact q66 cosine kernel
    * (production would precompute per-query ADC tables — an equivalent-up-
    * to-FP-regrouping optimization, documented not taken, since the oracle
    * pins the reconstruction form). Training is `iters` scans emitting
    * m·ksub·(dsub+1) integer partials per partition straight to the driver;
    * search is ONE scan with per-partition bounded heaps. Recall vs full
    * precision is pinned separately in AnnSparkSpec on planted clusters —
    * uniform-random vectors are PQ's worst case (measured ~0.38@10 there),
    * quality is a metric, never hidden in the oracle. */
  def pqTopK(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10,
             m: Int = 8, ksub: Int = 16, iters: Int = 2): DataFrame =
    pqTopKFrom(loadVecs(spark, dir), queriesFrom(spark, dir, q), k, m, ksub, iters)

  /** One sub-quantizer assignment: exact integer argmin of the L2 distance
    * on the lattice, ties to the lowest centroid index via the
    * `D·ksub + j` key (|lattice| ≤ ~6e5 on unit-scale embeddings keeps
    * D·ksub ≪ 2^63; the oracle uses the identical encoding). */
  private def pqAssign(cs: Array[Array[Array[Long]]], lat: Array[Long],
                       s: Int, dsub: Int): Int = {
    val ksub = cs(s).length
    var best = 0; var bestKey = Long.MaxValue
    var j = 0
    while (j < ksub) {
      var dd = 0L; var d = 0
      while (d < dsub) {
        val df = lat(s * dsub + d) - cs(s)(j)(d)
        dd += df * df; d += 1
      }
      val key = dd * ksub + j
      if (key < bestKey) { bestKey = key; best = j }
      j += 1
    }
    best
  }

  def pqTopKFrom(vecs: DataFrame, queries: Seq[EmbQuery], k: Int,
                 m: Int, ksub: Int, iters: Int = 2): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dim = queries.head.vec.length
    val dsub = dim / m
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val mm = m; val kss = ksub; val dss = dsub
    val lats = vecs.as[(Long, Array[Double])].map { case (id, v) =>
      (id, v.map(x => math.floor(x * 1e6 + 0.5).toLong))
    }
    // init: the ksub lowest vec_ids' subvectors (replayable seed choice)
    var cents: Array[Array[Array[Long]]] = {
      val seeds = lats.orderBy(col("_1")).limit(ksub).collect().sortBy(_._1).map(_._2)
      Array.tabulate(m)(s => Array.tabulate(ksub)(j =>
        java.util.Arrays.copyOfRange(seeds(j), s * dsub, (s + 1) * dsub)))
    }
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // integer partials: merge-order-free by construction, any reduce order
      val partials = lats.mapPartitions { it =>
        val cs = bc.value
        val sums = Array.fill(mm, kss)(new Array[Long](dss))
        val cnts = Array.ofDim[Long](mm, kss)
        it.foreach { case (_, lat) =>
          var s = 0
          while (s < mm) {
            val j = pqAssign(cs, lat, s, dss)
            cnts(s)(j) += 1
            var d = 0
            while (d < dss) { sums(s)(j)(d) += lat(s * dss + d); d += 1 }
            s += 1
          }
        }
        (for { s <- (0 until mm).iterator; j <- (0 until kss).iterator if cnts(s)(j) > 0 }
          yield (s, j, sums(s)(j), cnts(s)(j)))
      }.collect()
      val next = cents.map(_.map(_.clone()))
      partials.groupBy(p => (p._1, p._2)).foreach { case ((s, j), ps) =>
        val acc = new Array[Long](dsub); var n = 0L
        ps.foreach { case (_, _, sv, c) =>
          var d = 0
          while (d < dsub) { acc(d) += sv(d); d += 1 }
          n += c
        }
        next(s)(j) = acc.map(x => Math.floorDiv(x, n)) // floor (matches SQL //)
      }
      cents = next
    }
    // one search scan: assign final codes, reconstruct, exact q66 kernel
    val bcC = spark.sparkContext.broadcast(cents)
    val bcQ = spark.sparkContext.broadcast(queries.toArray)
    val kk = k
    val partial = lats.mapPartitions { it =>
      val cs = bcC.value; val qs = bcQ.value
      val qn = qs.map(qq => math.sqrt(dot(qq.vec, qq.vec)))
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val heaps = Array.fill(qs.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
      val recon = new Array[Double](mm * dss)
      it.foreach { case (id, lat) =>
        var s = 0
        while (s < mm) {
          val j = pqAssign(cs, lat, s, dss)
          var d = 0
          while (d < dss) { recon(s * dss + d) = cs(s)(j)(d).toDouble / 1e6; d += 1 }
          s += 1
        }
        var rr = 0.0; var i = 0
        while (i < recon.length) { rr += recon(i) * recon(i); i += 1 }
        val rn = math.sqrt(rr)
        var qi = 0
        while (qi < qs.length) {
          val qv = qs(qi).vec
          var sd = 0.0; i = 0
          while (i < recon.length) { sd += qv(i) * recon(i); i += 1 }
          val c = sd / (qn(qi) * rn)
          val key = (-c, id)
          val h = heaps(qi)
          if (h.size < kk) h.enqueue(key)
          else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
          qi += 1
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

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): embedding-level dedup that
    * bounds the quadratic by CLUSTERING first — k-means over the corpus,
    * pairwise cosine only WITHIN each cluster, keep one representative per
    * semantic-dup component. The cluster count is the scale knob: production
    * picks nlist so clusters stay bounded (the paper uses k ≈ 11k on LAION),
    * making per-cluster pairwise linear-ish in N; pairs that straddle
    * clusters are missed — the algorithm's documented approximation
    * (AnnSparkSpec pins recall 1.0 on planted well-separated clusters, where
    * the approximation is exact).
    *
    * Plan shape: centroids are the deterministic [[ivfCentroids]] (broadcast,
    * vectors never shuffle for training); each vector shuffles ONCE on its
    * cluster id for the within-cluster self-join; the exact-cosine verify
    * (the q44 left-to-right kernel) runs post-join in the join's own
    * partitioning; components resolve by hash-min label propagation
    * ([[graft.text.Dedup.componentLabels]] — the q63 engine); the verdict is
    * keep = (vec_id == component minimum). The q73 gate runs nlist = 1 —
    * every pair is in one cluster, so the relation must equal exact
    * all-pairs dedup, which the oracle re-derives via all-pairs cosine +
    * recursive-CTE closure (no centroid replay needed: at nlist = 1
    * clustering cannot change the answer, the q55 plan-equivalence trick). */
  def semDedup(spark: SparkSession, dir: String, nlist: Int = 1,
               theta: Double = 0.45, iters: Int = 2): DataFrame =
    semDedupFrom(loadVecs(spark, dir), nlist, theta, iters)

  def semDedupFrom(vecs: DataFrame, nlist: Int, theta: Double,
                   iters: Int = 2): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val assigned =
      if (nlist <= 1) vecs.withColumn("list", lit(0))
      else {
        val bcC = spark.sparkContext.broadcast(ivfCentroids(vecs, nlist, iters))
        val assignUdf = udf { (v: Seq[Double]) =>
          val cs = bcC.value; val arr = v.toArray
          var best = 0; var bestC = Double.NegativeInfinity
          var ci = 0
          while (ci < cs.length) {
            val c = cosine(cs(ci), arr)
            if (c > bestC) { bestC = c; best = ci }
            ci += 1
          }
          best
        }
        vecs.withColumn("list", assignUdf(col("v")))
      }
    // each vector shuffles ONCE on its cluster id (a self-join would move
    // |cluster|² vector copies through the exchange); the quadratic runs
    // in-memory per cluster, bounded by max cluster size — nlist is the knob
    // that bounds it, per the algorithm's contract
    val th = theta
    val pairs = assigned.select(col("list"), col("vec_id"), col("v"))
      .as[(Int, Long, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val ms = it.map { case (_, id, v) => (id, v) }.toArray.sortBy(_._1)
        for {
          i <- ms.indices.iterator; j <- (i + 1 until ms.length).iterator
          if cosine(ms(i)._2, ms(j)._2) >= th
        } yield (ms(i)._1, ms(j)._1)
      }
      .toDF("a", "b")
    val labels = graft.text.Dedup.componentLabels(pairs)
    val dupVerdicts = labels
      .select(col("doc_id").as("vec_id"), col("label").as("component"),
        when(col("doc_id") === col("label"), 1L).otherwise(0L).as("keep"))
      .localCheckpoint() // eager: O(dup members); lets the label set go now
    graft.CacheOps.freeLocalCheckpoint(labels)
    val singles = vecs.select(col("vec_id"))
      .join(dupVerdicts.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("vec_id").as("component"), lit(1L).as("keep"))
    dupVerdicts.unionByName(singles)
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

  /** Self-certifying LSH gate: per-query recall of [[lshTopK]] against the
    * exact [[bruteTopK]] top-k, emitted as gate rows — the measured recall
    * itself is oracle-pinned, so any drift in the LSH pipeline (signatures,
    * banding, rerank) breaks the hash even when q31's replica oracle would
    * drift in lock-step. */
  def lshRecall(spark: SparkSession, dir: String, q: Int = 5, k: Int = 10,
                nBits: Int = 16, bands: Int = 4): DataFrame = {
    val lsh = lshTopK(spark, dir, q, k, nBits, bands)
      .select(col("qid"), col("vec_id")).withColumn("hit", lit(1L))
    val brute = bruteTopK(spark, dir, q, k).select(col("qid"), col("vec_id"))
    brute.join(lsh, Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k_total"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp",
        floor(col("n_hit") * lit(10000.0) / col("k_total")).cast("long"))
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
