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
  */
object Evaluation {

  /** Gold triples from the in-repo oracle over the same synthesized
    * page corpus the pipeline reads. */
  def goldTriples(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().toSeq
    RefOracle.process(RefOracle.pagesFor(docs)).triples.toSeq
      .toDF("subj", "pred", "obj")
  }

  /** One-row P/R report for `triples` vs the oracle gold set. */
  def prVsOracle(spark: SparkSession, sfDir: String, triples: DataFrame): DataFrame = {
    import spark.implicits._
    val gold = goldTriples(spark, sfDir)
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
