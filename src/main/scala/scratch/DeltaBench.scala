package scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Canonicalize, KgDelta, Linking}

/** BENCH.md evidence row for round-5 incremental KG maintenance
  * (round-4 verdict "What's missing" #1): a steady ingest stream used
  * to re-run linking → CC → canonical rewrite over the FULL accumulated
  * triple table each period — O(table) per batch. KgDelta folds a batch
  * in with work scaling with the batch (new keys probe the persisted
  * LSH index; CC reruns only touched components; representatives
  * re-pick only dirty components; the triple view updates by signed
  * multiplicity).
  *
  * Protocol: N equal-sized batches of synthetic raw triples over a
  * GROWING key space — each batch brings `clustersPerBatch` new entity
  * clusters (3 linked surface-variant keys each: base hex, base+"x",
  * base+"xy") plus a 30% tail of references back to keys from earlier
  * batches (forcing count updates and dirty-component re-picks, the
  * realistic hard case). Per batch we time (a) the KgDelta fold and
  * (b) the from-scratch recompute over the accumulated table (node
  * build → canonMapAdaptive → rewrite, the exact chain the batch
  * pipeline runs). Both use the same size-adaptive CC. Equal batches
  * over a growing table: flat (a), growing (b) is the claim. A final
  * equality check (delta canon == full canon, delta view == full
  * rewrite) guards against benchmarking a divergent shortcut. One JSON
  * line to stdout.
  */
object DeltaBench {

  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 8
    val clustersPerBatch = if (args.length > 1) args(1).toInt else 400
    val rowsPerBatch = if (args.length > 2) args(2).toInt else 30000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def key(cluster: Int, variant: Int): String = {
      val base = graft.core.Text.sha256Hex(s"c$cluster").take(16)
      variant match { case 0 => base; case 1 => base + "x"; case _ => base + "xy" }
    }
    /** Deterministic batch: 70% of rows assert triples among this
      * batch's new clusters; 30% reference clusters from any earlier
      * batch (count updates on old entities). */
    def batch(i: Int): DataFrame = {
      val lo = i * clustersPerBatch
      val hi = lo + clustersPerBatch
      val rows = (0 until rowsPerBatch).map { r =>
        val h = graft.core.Hashing.nodeId(s"b$i", s"r$r").abs
        val old = i > 0 && r % 10 >= 7
        val c = if (old) (h % lo).toInt else lo + (h % clustersPerBatch).toInt
        val v = (h >> 8) % 3
        val sk = key(c, v.toInt)
        val ok = key(if (old) ((h >> 16) % lo).toInt
                     else lo + ((h >> 16) % clustersPerBatch).toInt, 0)
        (s"S$sk", "PER", sk, "p" + (h % 5), s"O$ok", "ORG", ok)
      }
      rows.toDF("subj", "subj_type", "subj_key", "pred",
        "obj", "obj_type", "obj_key")
    }

    val batches = (0 until nBatches).map(i => batch(i).localCheckpoint(true))
    // JIT warm-up on a throwaway copy of batch 0
    KgDelta.update(KgDelta.empty(spark), batches(0))
    Canonicalize.canonMapAdaptive(Linking.nodesFromTripleArgs(batches(0))).count()

    var state = KgDelta.empty(spark)
    var acc: DataFrame = null
    val deltaSec = new scala.collection.mutable.ArrayBuffer[Double]
    val fullSec = new scala.collection.mutable.ArrayBuffer[Double]
    batches.foreach { b =>
      val t0 = System.nanoTime()
      val (st2, _) = KgDelta.update(state, b)
      state = st2
      deltaSec += (System.nanoTime() - t0) / 1e9

      acc = if (acc == null) b else acc.unionByName(b).localCheckpoint(true)
      val t1 = System.nanoTime()
      val canon = Canonicalize.canonMapAdaptive(Linking.nodesFromTripleArgs(acc))
        .localCheckpoint(true)
      Canonicalize.rewrite(acc, canon).count()
      fullSec += (System.nanoTime() - t1) / 1e9
    }

    // divergence guard: the speed must not come from a wrong answer
    val fc = Canonicalize.canonMapAdaptive(Linking.nodesFromTripleArgs(acc))
      .localCheckpoint(true)
    require(state.canon.exceptAll(fc).isEmpty && fc.exceptAll(state.canon).isEmpty,
      "delta canon diverged from full recompute")
    val fullView = Canonicalize.rewrite(acc, fc)
    val dv = KgDelta.triples(state)
    require(dv.exceptAll(fullView).isEmpty && fullView.exceptAll(dv).isEmpty,
      "delta triple view diverged from full rewrite")

    def f(xs: Seq[Double]) = xs.map(s => f"$s%.2f").mkString("[", ",", "]")
    val q = nBatches / 4
    def ratio(xs: Seq[Double]) =
      (xs.takeRight(q).sum / q) / (xs.slice(q, 2 * q).sum / q)
    println(s"""{"bench":"kg_delta_vs_full","n_batches":$nBatches,""" +
      s""""rows_per_batch":$rowsPerBatch,"clusters_per_batch":$clustersPerBatch,""" +
      s""""delta_sec":${f(deltaSec.toSeq)},"full_sec":${f(fullSec.toSeq)},""" +
      f""""delta_late_over_early":${ratio(deltaSec.toSeq)}%.2f,""" +
      f""""full_late_over_early":${ratio(fullSec.toSeq)}%.2f,""" +
      f""""final_speedup":${fullSec.last / deltaSec.last}%.2f}""")
    spark.stop()
  }
}
