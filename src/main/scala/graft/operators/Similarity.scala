package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - bruteForceTopK — the exact baseline. The query set is small and
  *    broadcast; the corpus streams through ONE narrow pass scoring
  *    every (query, vector) pair, then the two-level top-k below.
  *  - lshTopK — the scale path for LARGE query sets: both sides hash
  *    into random-hyperplane sign buckets (multi-probe: each query also
  *    probes the `probes` nearest buckets by flipping low bits), join
  *    bucket-to-bucket, exact cosine within the bucket, per-query
  *    top-k. Recall < 1 by design; measured against brute force in
  *    SimilaritySpec. `planes <= 0` auto-scales the bucket count with
  *    corpus size so expected occupancy stays bounded (see autoPlanes).
  *
  * Top-k shape at scale: a plain `row_number over (partition by
  * query_id)` would shuffle ALL |corpus|×|queries| scored rows into
  * |queries| reducer partitions — a hot-partition collapse at 10^12
  * rows (windows have no map-side combine). Instead [[partialTopK]]
  * keeps a bounded heap of k candidates per query inside each input
  * partition (narrow mapPartitions), so at most k·|queries| rows leave
  * any partition; the final exact window then sorts only
  * ≤ k·|queries|·|partitions| rows. Exact, not approximate: the
  * (cos desc, vec_id asc) order is total (vec_id is unique), so the
  * global top-k is contained in the union of per-partition top-k's.
  *
  * Cosine is computed with Column expressions (zip_with + aggregate) —
  * codegen-friendly, no UDF serialization of the vectors.
  */
object Similarity {

  /** Exact cosine expression over two array<float/double> columns —
    * the native codegen'd [[graft.functions.CosineSimilarity]]
    * expression (one fused loop, no per-element lambda dispatch, no
    * zipped-array allocation; measured 33× the HOF version on the
    * 4M-pair scoring micro-bench, BENCH.md round 3). Zero-norm
    * vectors score 0.0 —
    * same convention as the scalar Dedup.cosine; without the guard,
    * ANSI mode turns the 0/0 into a job-killing DIVIDE_BY_ZERO the
    * moment one bad embedding appears in the corpus. */
  def cosineCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.cosine(a, b)

  /** The original higher-order-function cosine (`aggregate ∘ zip_with`)
    * — kept as the independently-derived reference implementation the
    * native expression is spec-checked bit-identical against, and as
    * the micro-bench baseline. */
  def cosineColHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0d), (acc, x) => acc + x * x)
    val nb = aggregate(b, lit(0.0d), (acc, x) => acc + x * x)
    when(na === 0.0d || nb === 0.0d, lit(0.0d)).otherwise(dot / sqrt(na * nb))
  }

  /** Narrow scored stream for the brute-force path: corpus × broadcast
    * queries (queries = corpus rows whose vec_id ∈ queryIds), one pass,
    * no corpus shuffle. Columns: (query_id, vec_id, cos). */
  def bruteScored(emb: DataFrame, queryIds: Seq[Long]): DataFrame = {
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosineCol(col("qv"), col("embedding")), 4).as("cos"))
  }

  /** Per-partition bounded-heap top-k (the map-side combine a window
    * lacks): emits at most k rows per (input partition, query). */
  def partialTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // max-heap with the WORST candidate on top. The comparator is
        // the TOTAL order the final window uses — java Double.compare
        // ranks NaN greatest, exactly Spark's sort semantics — and the
        // same comparator drives eviction: a raw `c > wc` would never
        // evict a NaN head (all NaN comparisons are false), silently
        // dropping genuine candidates when a zero-norm vector yields a
        // NaN cosine.
        val worstFirst = new Ordering[(Double, Long)] {
          def compare(a: (Double, Long), b: (Double, Long)): Int = {
            val c = java.lang.Double.compare(a._1, b._1)
            if (c != 0) -c // lower cos = worse = greater (heap head)
            else java.lang.Long.compare(a._2, b._2) // higher id = worse
          }
        }
        val heaps = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (q, id, c) =>
          val h = heaps.getOrElseUpdate(q,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < k) h.enqueue((c, id))
          else if (worstFirst.lt((c, id), h.head)) { h.dequeue(); h.enqueue((c, id)) }
        }
        heaps.iterator.flatMap { case (q, h) =>
          h.iterator.map { case (c, id) => (q, id, c) }
        }
      }
      .toDF("query_id", "vec_id", "cos")
  }

  /** Exact per-query top-k: bounded-heap partials, then a final window
    * over the tiny reduced set. */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    partialTopK(scored, k)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rk"))
  }

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    topK(bruteScored(emb, queryIds), k)

  /** Bucket-count policy: planes = ⌈log₂(n / targetBucket)⌉ (floor 4),
    * so the expected bucket occupancy n / 2^planes stays ≈ targetBucket
    * as the corpus grows — at 10^12 vectors that is 28 planes / 2^28
    * buckets, keeping the within-bucket exact-cosine work bounded.
    * (Recall is then governed by `probes`, which multi-probes the
    * Hamming-nearest buckets — scale probes, not bucket size.) */
  def autoPlanes(n: Long, targetBucket: Long = 1L << 12): Int =
    math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, (n + targetBucket - 1) / targetBucket) - 1))

  /** Per-bucket occupancy for a given plane count — the quantity
    * autoPlanes bounds; logged by SimilaritySpec. */
  def bucketOccupancy(emb: DataFrame, planes: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (_, v) => Dedup.signBucket(v, planes) }
      .toDF("bucket").groupBy("bucket").count()
  }

  /** LSH-bucketed ANN: sign-bucket both sides, multi-probe the query
    * side, exact cosine inside candidate buckets, two-level exact top-k
    * on the bucket-limited candidates.
    *
    * Probe order (standard multi-probe LSH, Lv et al. VLDB 2007): the
    * buckets most likely to hold missed neighbors are those across the
    * planes the query was CLOSEST to — smallest |planeDot|. Probes flip
    * those planes first, in increasing-margin order; `marginProbes =
    * false` falls back to the round-2 unconditional low-bit flips
    * (kept so SimilaritySpec can measure the recall gain at a fixed
    * probe budget).
    *
    * `planes <= 0` → autoPlanes over `corpusSize` if the caller knows
    * it (repeated calls over one cached corpus shouldn't each pay a
    * full count pass), else over one `emb.count()`. */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
              planes: Int = 0, probes: Int = 4,
              corpusSize: Option[Long] = None,
              marginProbes: Boolean = true): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val p = if (planes > 0) planes
            else autoPlanes(corpusSize.getOrElse(emb.count()))
    val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, Dedup.signBucket(v, p), v) }
      .toDF("vec_id", "bucket", "v")
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("bucket").as("qb"), col("v").as("qv"))
      .as[(Long, Long, Array[Double])]
      .flatMap { case (id, b, v) =>
        // home bucket plus single-plane flips, nearest planes first
        val nProbes = math.min(probes - 1, p)
        val flips =
          if (marginProbes)
            (0 until p).sortBy(i => math.abs(Dedup.planeDot(v, i))).take(nProbes)
          else 0 until nProbes
        (Seq(b) ++ flips.map(i => b ^ (1L << i)))
          .distinct.map(pb => (id, pb, v))
      }
      .toDF("query_id", "bucket", "qv")
    val scored = corpus.join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosineCol(col("qv"), col("v")), 4).as("cos"))
    topK(scored, k)
  }

  // ------------------------------------------------------------------
  // IVF: k-means coarse quantizer + probed-list exact search — the
  // OTHER standard ANN scale path (complements lshTopK's hyperplane
  // buckets with data-ADAPTIVE cells; wins when the corpus is
  // clustered rather than isotropic)
  // ------------------------------------------------------------------

  private def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i)
      nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** argmax-cosine cluster of `v` among `cents` (ties → lowest id). */
  private def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestCos = Double.NegativeInfinity; var c = 0
    while (c < cents.length) {
      val s = cosineArr(cents(c), v)
      if (s > bestCos) { bestCos = s; best = c }
      c += 1
    }
    best
  }

  /** Deterministic-seeded Lloyd k-means over the embedding column,
    * cosine assignment — built from the primitives that scale:
    *
    *   - init: the k rows ranked first by `xxhash64(vec_id, seed)` — a
    *     deterministic spread sample, one TakeOrdered, no collect of
    *     anything corpus-sized;
    *   - each iteration is ONE narrow pass: mapPartitions accumulates
    *     per-partition (cluster, dim-sum, count) partials — k·dim
    *     doubles of state per task, the same map-side-combine shape as
    *     a partial HashAggregate — and only parts×k tiny rows reach the
    *     driver for the final reduce. The corpus is never shuffled.
    *
    * Centroid doubles depend on partition summation order (floating
    * sums are not associative) — callers needing bit-stable results
    * fix the input partitioning; IVF recall is insensitive to these
    * last-bit differences (SimilaritySpec measures it).
    */
  def kmeansCentroids(emb: DataFrame, nlist: Int, iters: Int,
                      seed: Long): Array[Array[Double]] = {
    require(nlist >= 1 && iters >= 0, "nlist >= 1, iters >= 0")
    val spark = emb.sparkSession
    import spark.implicits._
    var cents = emb.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(nlist)
      .select("embedding").as[Array[Double]].collect()
    val data = emb.select("embedding").as[Array[Double]]
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = data.mapPartitions { it =>
        val cs = bc.value
        val dim = if (cs.isEmpty) 0 else cs(0).length
        val sums = Array.ofDim[Double](cs.length, dim)
        val counts = new Array[Long](cs.length)
        it.foreach { v =>
          val c = nearest(cs, v)
          counts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += v(i); i += 1 }
        }
        (0 until cs.length).iterator
          .filter(counts(_) > 0)
          .map(c => (c, sums(c), counts(c)))
      }.collect()
      val byCluster = partials.groupBy(_._1)
      cents = cents.zipWithIndex.map { case (old, c) =>
        byCluster.get(c) match {
          case Some(ps) =>
            val n = ps.map(_._3).sum
            val dim = old.length
            val s = new Array[Double](dim)
            ps.foreach { case (_, ds, _) =>
              var i = 0; while (i < dim) { s(i) += ds(i); i += 1 } }
            val out = new Array[Double](dim)
            var i = 0; while (i < dim) { out(i) = s(i) / n; i += 1 }
            out
          case None => old // empty cell keeps its centroid
        }
      }
      bc.destroy()
    }
    cents
  }

  /** IVF top-k: corpus rows live in their nearest-centroid list (one
    * narrow assignment pass, corpus never shuffles); each query probes
    * its `nprobe` best lists; exact cosine inside the probed lists;
    * the same two-level bounded-heap top-k as the brute/LSH paths.
    * Scored row count ≈ |corpus|·nprobe/nlist per query instead of
    * |corpus| — recall governed by nprobe. `nprobe = nlist` degenerates
    * to exact brute force (every pair scored exactly once, since each
    * corpus row is in exactly one list) — spec-asserted equal to
    * [[bruteForceTopK]], which is the DuckDB-oracled baseline. */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 5, seed: Long = 7L): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "1 <= nprobe <= nlist")
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(emb, nlist, iters, seed)
    val bc = spark.sparkContext.broadcast(cents)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (nearest(cs, v), id, v) }
      }
      .toDF("list_id", "vec_id", "v")
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val cs = bc.value
        (0 until cs.length).sortBy(c => (-cosineArr(cs(c), v), c))
          .take(nprobe).map(c => (id, c, v))
      }
      .toDF("query_id", "list_id", "qv")
    val scored = corpus.join(broadcast(queries), "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosineCol(col("qv"), col("v")), 4).as("cos"))
    // materialize the tiny (<= k * |queries| rows) result eagerly so
    // the centroid broadcast can be destroyed — a lazy return would
    // leak one broadcast per call for the session's lifetime
    val out = topK(scored, k).localCheckpoint(true)
    bc.destroy()
    out
  }
}
