package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - bruteForceTopK — the exact baseline. The query set is small and
  *    broadcast; the corpus streams through ONE narrow pass scoring
  *    every (query, vector) pair, then a per-query top-k. This is the
  *    correct 100 TB shape for small query batches: no corpus shuffle,
  *    score rows (|corpus|·|queries|) are reduced map-side by the
  *    partial Window/TakeOrdered aggregation before the tiny final
  *    shuffle on query_id.
  *  - lshTopK — the scale path for LARGE query sets: both sides hash
  *    into random-hyperplane sign buckets (multi-probe: each query also
  *    probes the `probes` nearest buckets by flipping low bits), join
  *    bucket-to-bucket, exact cosine within the bucket, per-query
  *    top-k. Recall < 1 by design; measured against brute force in
  *    SimilaritySpec.
  *
  * Cosine is computed with Column expressions (zip_with + aggregate) —
  * codegen-friendly, no UDF serialization of the vectors.
  */
object Similarity {

  /** Exact cosine expression over two array<float/double> columns. */
  def cosineCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0d), (acc, x) => acc + x * x)
    val nb = aggregate(b, lit(0.0d), (acc, x) => acc + x * x)
    dot / sqrt(na * nb)
  }

  /** Exact top-k cosine neighbors for each query vector (self-join by
    * id membership: queries = corpus rows whose vec_id ∈ queryIds). */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosineCol(col("qv"), col("embedding")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rk"))
  }

  /** LSH-bucketed ANN: sign-bucket both sides, multi-probe the query
    * side (bit-flip probes), exact cosine inside candidate buckets. */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
              planes: Int = 8, probes: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, Dedup.signBucket(v, planes), v) }
      .toDF("vec_id", "bucket", "v")
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("bucket").as("qb"), col("v").as("qv"))
      .as[(Long, Long, Array[Double])]
      .flatMap { case (id, b, v) =>
        // probe the home bucket plus single-bit flips (nearest buckets)
        (Seq(b) ++ (0 until math.min(probes - 1, planes)).map(i => b ^ (1L << i)))
          .distinct.map(pb => (id, pb, v))
      }
      .toDF("query_id", "bucket", "qv")
    val scored = corpus.join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosineCol(col("qv"), col("v")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rk"))
  }
}
