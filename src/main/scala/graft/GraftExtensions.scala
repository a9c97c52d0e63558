package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: makes the engine's native
  * Catalyst expressions available to pure-SQL users via
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * DataFrame callers don't need it — [[graft.functions.cosine]] wraps
  * the expression as a Column directly. The spec registers the same
  * descriptor on the shared test session and runs it through SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(graft.functions.CosineSimilarity.descriptor)
    ext.injectFunction(graft.functions.GraftBandJoin.descriptor)
    ext.injectFunction(graft.functions.FreqItemsSketch.descriptor)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
