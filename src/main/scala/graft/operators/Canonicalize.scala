package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** A14+A15: cluster linked entity nodes with connected components, pick
  * a deterministic canonical representative per cluster (most frequent
  * surface, ties → lexicographically smallest), and rewrite triples'
  * subject/object to it.
  *
  * Scale notes: the canonical map has one row per distinct entity node —
  * orders of magnitude smaller than the triple stream. The two rewrite
  * joins are plain equi-joins on (etype, norm_key); Catalyst/AQE
  * broadcasts the map when it fits and falls back to a shuffle join
  * (with AQE skew splitting for hot entities like 北京) when it does not,
  * so no hint is hard-coded here.
  */
object Canonicalize {

  /** (etype, norm_key) → canonical surface, for every node. */
  def canonMap(nodes: Dataset[NodeRow], edges: Dataset[EdgeRow]): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._

    val idNodes = nodes.map(n => (Hashing.nodeId(n.etype, n.norm_key),
        n.etype, n.norm_key, n.surface, n.cnt))
      .toDF("id", "etype", "norm_key", "surface", "cnt")
    val idEdges = edges.map(e => (Hashing.nodeId(e.etype, e.key_a),
        Hashing.nodeId(e.etype, e.key_b)))
      .toDF("src", "dst")

    val assign = ConnectedComponents.run(idEdges) // (id, comp)
    val withComp = idNodes.join(assign, Seq("id"), "left_outer")
      .withColumn("comp", coalesce(col("comp"), col("id")))

    val w = Window.partitionBy("comp").orderBy(col("cnt").desc, col("surface").asc)
    val reps = withComp
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("comp"), col("surface").as("canon"))

    withComp.join(reps, "comp")
      .select(col("etype"), col("norm_key"), col("canon"))
  }

  /** Rewrite raw triples to canonical (subj, pred, obj), deduplicated.
    * Unlinked mentions keep their own surface (left_outer + coalesce). */
  def rewrite(raw: Dataset[RawTripleRow], canon: DataFrame): DataFrame = {
    val subjMap = canon.select(col("etype").as("subj_type"),
      col("norm_key").as("subj_key"), col("canon").as("subj_canon"))
    val objMap = canon.select(col("etype").as("obj_type"),
      col("norm_key").as("obj_key"), col("canon").as("obj_canon"))
    raw.toDF()
      .join(subjMap, Seq("subj_type", "subj_key"), "left_outer")
      .join(objMap, Seq("obj_type", "obj_key"), "left_outer")
      .select(coalesce(col("subj_canon"), col("subj")).as("subj"),
        col("pred"),
        coalesce(col("obj_canon"), col("obj")).as("obj"))
      .distinct()
  }
}
