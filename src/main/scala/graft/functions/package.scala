package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{graftbridge => bridge}

/** Column-level API over the engine's native Catalyst expressions. */
package object functions {

  /** Cosine similarity of two array<float> / array<double> columns —
    * the codegen'd [[CosineSimilarity]] expression. */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimilarity(bridge.expression(a), bridge.expression(b)))
}
