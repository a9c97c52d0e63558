package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.{Hashing, TextStats}

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), n-gram Jaccard (inverted-index join), MinHash
  * LSH (shingle → minhash → band → bucket join), SimHash (Hamming-band
  * blocking) and embedding-cosine near-dup (bucketed).
  *
  * Scale shape, per operator:
  *  - exact:   one salted-safe groupBy on a 128-bit content hash — the
  *             hash is computed scan-side so the shuffle carries (hash,
  *             id) only, never the text;
  *  - ngram:   inverted-index self-join on gram → pair-count groupBy.
  *             At corpus scale, ultra-frequent grams are dropped first
  *             (document-frequency cap) — a hot gram contributes
  *             O(df²) candidate rows, so the cap is the skew guard;
  *  - minhash: signatures are computed in one narrow pass (no
  *             explode-shuffle per hash); only band keys shuffle;
  *  - simhash: 64-bit sketch per doc, 4×16-bit pigeonhole bands find
  *             every pair within Hamming distance ≤ 3 without O(n²);
  *  - cosine:  random-hyperplane LSH buckets, exact cosine only within
  *             buckets.
  *
  * All candidate generation is approximate-but-recall-bounded; every
  * emitted pair is verified with the EXACT measure (Jaccard / Hamming /
  * cosine), so output never contains false positives (determinism:
  * SURVEY.md §7 hard-part 5).
  */
object Dedup {

  /** Deterministically plants duplicates into a corpus so dedup queries
    * have non-trivial output on the driver's random-filler documents:
    * every doc_id % 7 == 0 gains an EXACT copy at id+1_000_000, every
    * doc_id % 5 == 0 a NEAR copy (one appended sentence) at id+2_000_000.
    * Mirrored 1:1 in the DuckDB oracle SQL. */
  def planted(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra trailing sentence padding words")).as("text")))
  }

  /** Exact dedup: group by content hash, keep the smallest doc_id as
    * the representative. Output: one row per duplicate GROUP (n > 1).
    * md5 is computed before the shuffle; only (hash, id) moves. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
      .filter(col("n") > 1)

  /** Exact dedup keep-list: distinct texts survive via min-doc_id. */
  def exactKeep(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("doc_id"))

  /** Exact word-3-gram Jaccard near-dup pairs via inverted index:
    * explode grams → self-join on gram → |A∩B| per pair → Jaccard with
    * per-doc gram counts. `maxDf` drops grams shared by more than that
    * many docs (stopword-gram skew guard; lowers recall only for pairs
    * whose entire overlap is ultra-common grams). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                        maxDf: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) => TextStats.wordNgrams(t, n).iterator.map(g => (id, g)) }
      .toDF("doc_id", "gram")
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val kept = grams.join(
      grams.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf),
      "gram")
    val inter = kept.select(col("gram"), col("doc_id").as("a"))
      .join(kept.select(col("gram"), col("doc_id").as("b")), "gram")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard",
        col("inter") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash-LSH near-dup pairs: per-doc signature (narrow), band-key
    * explode, bucket self-join, exact-Jaccard verification. Same
    * blocking machinery as entity linking (graft.operators.Linking)
    * applied at document granularity.
    *
    * Payload discipline (the 100 TB shape): the band self-join moves
    * ONLY (doc_id, band_idx, band_key) — 24 bytes/row. Shipping each
    * doc's shingle array through the ×numBands explode and both sides
    * of the shuffle would write ~2·numBands× the corpus to shuffle
    * disk. The few surviving candidate PAIRS are instead joined back to
    * the one-row-per-doc text table (two cheap hash joins on doc_id)
    * and shingles are recomputed narrowly in the verify step — CPU on
    * candidates only, traded for corpus-scale shuffle IO. */
  def minhashPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 32,
                   numBands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slim = docs.select(col("doc_id"), col("text"))
    val banded = slim.as[(Long, String)]
      .flatMap { case (id, t) =>
        val bands = Hashing.bandKeys(
          Hashing.minhash(TextStats.wordNgrams(t, n), numHashes), numBands)
        bands.iterator.zipWithIndex.map { case (k, i) => (id, i, k) }
      }
      .toDF("doc_id", "band_idx", "band_key")
    val cands = banded.alias("x").join(banded.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .dropDuplicates("a", "b")
    cands
      .join(slim.select(col("doc_id").as("a"), col("text").as("ta")), "a")
      .join(slim.select(col("doc_id").as("b"), col("text").as("tb")), "b")
      .select(col("a"), col("b"), col("ta"), col("tb"))
      .as[(Long, Long, String, String)]
      .flatMap { case (a, b, ta, tb) =>
        val j = Hashing.jaccard(TextStats.wordNgrams(ta, n), TextStats.wordNgrams(tb, n))
        if (j >= threshold) Some((a, b, math.rint(j * 10000) / 10000)) else None
      }
      .toDF("a", "b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit sketch, 4×16-bit pigeonhole bands
    * (any pair within Hamming distance ≤ 3 shares at least one exact
    * band), exact Hamming verification. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, TextStats.simhash(t)) }
      .toDF("doc_id", "sim")
    val banded = sigs.select(col("doc_id"), col("sim"),
      explode(typedLit((0 until 4).toArray)).as("band_idx"))
      .withColumn("band_key",
        expr("shiftrightunsigned(sim, band_idx * 16)").bitwiseAND(lit(0xffffL)))
    banded.alias("x").join(banded.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sim").as("sa"), col("y.sim").as("sb"))
      .dropDuplicates("a", "b")
      .as[(Long, Long, Long, Long)]
      .flatMap { case (a, b, sa, sb) =>
        val d = TextStats.hamming(sa, sb)
        if (d <= maxHamming) Some((a, b, d)) else None
      }
      .toDF("a", "b", "hamming")
  }

  /** Embedding-cosine near-dup pairs. Candidate generation: random-
    * hyperplane LSH (sign-bit buckets over `planes` deterministic
    * pseudo-hyperplanes); exact cosine within buckets only. With
    * `planes = 0` it degrades to a single bucket = exact O(n²) — used
    * by tests to measure the bucketed variant's recall. */
  def embedCosinePairs(emb: DataFrame, threshold: Double = 0.99,
                       planes: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sigs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, signBucket(v, planes), v) }
      .toDF("vec_id", "bucket", "v")
    sigs.alias("x").join(sigs.alias("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("x.v").as("va"),
        col("y.vec_id").as("b"), col("y.v").as("vb"))
      .as[(Long, Array[Double], Long, Array[Double])]
      .flatMap { case (a, va, b, vb) =>
        val c = cosine(va, vb)
        if (c >= threshold) Some((a, b, math.rint(c * 10000) / 10000)) else None
      }
      .toDF("a", "b", "cos")
  }

  /** Signed projection of `v` onto deterministic pseudo-hyperplane `p`
    * (coefficients splitmix64-derived from (plane, dim) — identical on
    * every executor with zero driver state). The |value| is the margin
    * to the plane boundary, which orders multi-probe LSH probes
    * (Similarity.lshTopK). */
  def planeDot(v: Array[Double], p: Int): Double = {
    var dot = 0.0
    var i = 0
    while (i < v.length) {
      // map hash to [-1, 1)
      val coef = Hashing.splitmix64(p.toLong * 131071L + i) / 9.223372036854776e18
      dot += coef * v(i)
      i += 1
    }
    dot
  }

  /** Sign-bit bucket id from `planes` deterministic hyperplanes. */
  def signBucket(v: Array[Double], planes: Int): Long = {
    if (planes <= 0) return 0L
    var bucket = 0L
    var p = 0
    while (p < planes) {
      if (planeDot(v, p) >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}
