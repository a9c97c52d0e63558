package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{graftbridge => bridge}

/** Column-level API over the engine's native Catalyst expressions. */
package object functions {

  /** Cosine similarity of two array<float> / array<double> columns —
    * the codegen'd [[CosineSimilarity]] expression. */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimilarity(bridge.expression(a), bridge.expression(b)))

  /** Backward time-band join predicate: true iff `rightTime` lies in
    * `[leftTime - bandSeconds, leftTime]`. Write the join as
    * `l.join(r, bandJoin(l("ts"), r("ts2"), 120))` — correct on any
    * session; with [[graft.plans.BandJoinRewrite]] registered the join
    * is re-planned from BNLJ to the linear bucketed equi-join. */
  def bandJoin(leftTime: Column, rightTime: Column, bandSeconds: Long): Column =
    bridge.column(GraftBandJoin(bridge.expression(leftTime),
      bridge.expression(rightTime),
      org.apache.spark.sql.catalyst.expressions.Literal(bandSeconds)))

  /** Misra-Gries frequent-items sketch aggregate over a string column:
    * ≤ k candidate items as a sorted array, guaranteed to contain
    * every item with frequency > n/(k+1). Candidates only — exact-
    * recount downstream (see TextAnalysis.frequentTerms). */
  def freqItems(c: Column, k: Int): Column =
    bridge.column(FreqItemsSketch(bridge.expression(c), k).toAggregateExpression())
}
