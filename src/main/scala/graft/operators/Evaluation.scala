package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.oracle.RefOracle

/** A19: the engine's own quality number as a first-class query — triple
  * precision/recall vs the reference oracle's gold triples, emitted as
  * one row (tp, fp, fn, precision, recall). Exposed to the driver as
  * `q_kg_eval`; PipelineSpec asserts it equals the inline spec
  * computation and clears the ≥0.95 gate (BASELINE.json).
  *
  * Scale shape: the gold side is the reference's test corpus — small by
  * definition (the oracle is single-threaded) — so it is built
  * driver-side and BROADCAST; the pipeline side stays distributed (a
  * left_semi join + counts, no collect of predicted triples).
  *
  * Gold-corpus cap: evaluation is DEFINED over a bounded gold corpus —
  * the first [[GoldCorpusCap]] documents by doc_id — never over
  * whatever corpus the caller points at. Without the cap these queries
  * would `.collect()` the full input to the driver the day someone runs
  * them against a production corpus (the round-2 verdict's one
  * weak-at-scale finding). The cap is a deterministic distributed
  * TakeOrdered (orderBy + limit), so the driver only ever holds ≤ cap
  * documents; at the sandbox SFs (≤ 5k docs) it changes nothing, so the
  * P/R numbers and spec mirrors are unaffected.
  */
object Evaluation {

  /** Max documents in the gold corpus (first N by doc_id). */
  val GoldCorpusCap = 10000

  /** The bounded gold corpus: first `cap` docs by doc_id, collected. */
  private def goldDocs(spark: SparkSession, sfDir: String,
                       cap: Int): Seq[(Long, String, String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .orderBy("doc_id").limit(cap)
      .as[(Long, String, String, String)].collect().toSeq
  }

  /** Gold triples from the in-repo oracle over the (capped) gold slice
    * of the same synthesized page corpus the pipeline reads. */
  def goldTriples(spark: SparkSession, sfDir: String,
                  cap: Int = GoldCorpusCap): DataFrame = {
    import spark.implicits._
    RefOracle.process(RefOracle.pagesFor(goldDocs(spark, sfDir, cap))).triples.toSeq
      .toDF("subj", "pred", "obj")
  }

  /** Per-entity-type mention P/R/F1 — the reference's own evaluation
    * shape (per-type precision/recall/F1 on its test corpus). One row
    * per etype, strict span match on (url, sent_idx, begin, end,
    * etype); gold mentions from the oracle, broadcast; the pipeline
    * side never collects. */
  def mentionPrByType(spark: SparkSession, sfDir: String,
                      mentions: DataFrame, cap: Int = GoldCorpusCap): DataFrame = {
    import spark.implicits._
    val docs = goldDocs(spark, sfDir, cap)
    val goldPages = RefOracle.pagesFor(docs)
    val gold = RefOracle.process(goldPages).mentions
      .map { case (url, si, _, ty, b, e) => (url, si, ty, b, e) }
      .toDF("url", "sent_idx", "etype", "begin", "end").distinct()
    val key = Seq("url", "sent_idx", "etype", "begin", "end")
    // restrict predictions to the gold documents (broadcast semi join on
    // url): when the corpus is larger than the gold cap, predictions on
    // out-of-gold pages are out of scope, not false positives
    val goldUrls = goldPages.map(_.url).distinct.toDF("url")
    // localCheckpoint: pred feeds three aggregations (tp/np and, via
    // recompute, any later action) — materialize the tag chain once
    val pred = mentions.select(key.map(col): _*)
      .join(broadcast(goldUrls), Seq("url"), "left_semi")
      .distinct().localCheckpoint(true)
    val tp = pred.join(broadcast(gold), key, "left_semi")
      .groupBy("etype").agg(count(lit(1)).as("tp"))
    val np = pred.groupBy("etype").agg(count(lit(1)).as("np"))
    val ng = gold.groupBy("etype").agg(count(lit(1)).as("ng"))
    val out = np.join(ng, Seq("etype"), "full_outer")
      .join(tp, Seq("etype"), "left_outer")
      .select(col("etype"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("np"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("ng"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      // each metric from the RAW counts, rounded exactly once — deriving
      // f1 from rounded p/r would compound rounding error
      .withColumn("precision",
        round(when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(col("tp") / (col("tp") + col("fp"))), 4))
      .withColumn("recall",
        round(when(col("tp") + col("fn") === 0, 0.0)
          .otherwise(col("tp") / (col("tp") + col("fn"))), 4))
      .withColumn("f1",
        round(when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, 0.0)
          .otherwise(lit(2.0) * col("tp") /
            (lit(2L) * col("tp") + col("fp") + col("fn"))), 4))
    out.orderBy("etype")
  }

  /** One-row P/R report for `triples` vs the oracle gold set.
    * Canonicalized triples carry no per-url provenance, so precision is
    * meaningful when the pipeline ran over the gold corpus itself (the
    * reference's evaluation setup); with a larger corpus, use the
    * per-url [[mentionPrByType]], which scopes predictions to gold. */
  def prVsOracle(spark: SparkSession, sfDir: String, triples: DataFrame,
                 cap: Int = GoldCorpusCap): DataFrame = {
    import spark.implicits._
    val gold = goldTriples(spark, sfDir, cap)
    val pred = triples.select("subj", "pred", "obj").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPred = pred.count()
    val tp = pred.join(broadcast(gold), Seq("subj", "pred", "obj"), "left_semi").count()
    pred.unpersist()
    val fp = nPred - tp
    val fn = gold.count() - tp // gold is distinct by construction (a Set)
    Seq((tp, fp, fn,
        if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp),
        if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)))
      .toDF("tp", "fp", "fn", "precision", "recall")
  }
}
