package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Canonicalize, DurableKg, KgDelta, Linking}

/** Durable delta maintenance: per-batch O(batch) log appends + atomic
  * commits; resume reconstructs the exact state; torn folds are
  * invisible; committed folds are restart no-ops. */
class DurableKgSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Slim =
    Seq("subj", "subj_type", "subj_key", "pred", "obj", "obj_type", "obj_key")

  private def canonSet(df: DataFrame): Set[(String, String, String)] =
    df.select("etype", "norm_key", "canon")
      .as[(String, String, String)].collect().toSet

  private def tripleSet(df: DataFrame): Set[(String, String, String)] =
    df.select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet

  test("interrupted-and-resumed == uninterrupted == full recompute; retry and torn-fold safety") {
    val raw = Pipeline.runOnTestdata(spark, "/root/testdata/sf0.001")
      .rawTriples.toDF().localCheckpoint(true)
    val batches = (0 until 3).map(b =>
      raw.filter(pmod(xxhash64(col("url")), lit(3)) === b)
        .select(Slim.map(col): _*).localCheckpoint(true))

    // uninterrupted durable run
    val dirA = Files.createTempDirectory("graft-durablekg-a").toString
    val a = new DurableKg(spark, dirA)
    batches.zipWithIndex.foreach { case (b, i) => assert(a.fold(b, i).isDefined) }

    // interrupted run: two folds, then a TORN third fold (log + keyed
    // dirs written, no commit marker — a crash mid-fold), then resume
    // from a fresh instance and fold the real batch 2
    val dirB = Files.createTempDirectory("graft-durablekg-b").toString
    val b1 = new DurableKg(spark, dirB)
    assert(b1.fold(batches(0), 0).isDefined)
    assert(b1.fold(batches(1), 1).isDefined)
    Seq(("a", "p", "TORN")).toDF("subj", "pred", "obj")
      .write.parquet(s"$dirB/log/support/batch=2")
    Seq(("X", "k", "TORN")).toDF("etype", "norm_key", "canon")
      .write.parquet(s"$dirB/keyed/v=2/canon")

    val b2 = new DurableKg(spark, dirB) // resume: reconstructs from committed folds only
    assert(b2.committed == Seq(0L, 1L))
    assert(canonSet(b2.state.canon) == canonSet(b1.state.canon),
      "resumed state diverged from the pre-crash state")
    assert(b2.fold(batches(1), 1).isEmpty, "committed batch must re-fold as a no-op")
    assert(b2.fold(batches(2), 2).isDefined) // the retry overwrites the torn dirs

    // ground truth: full recompute over everything
    val acc = batches.reduce(_ unionByName _)
    val full = Canonicalize.canonMapAdaptive(Linking.nodesFromTripleArgs(acc))
    val expCanon = canonSet(full)
    val expTriples = tripleSet(Canonicalize.rewrite(acc, full))
    assert(canonSet(a.state.canon) == expCanon)
    assert(canonSet(b2.state.canon) == expCanon,
      "resumed+retried durable state diverged from full recompute")
    assert(tripleSet(KgDelta.triples(a.state)) == expTriples)
    assert(tripleSet(KgDelta.triples(b2.state)) == expTriples)

    // cold reconstruction from disk alone (no in-memory carryover)
    val b3 = new DurableKg(spark, dirB)
    assert(b3.committed == Seq(0L, 1L, 2L))
    assert(canonSet(b3.state.canon) == expCanon)
    assert(tripleSet(KgDelta.triples(b3.state)) == expTriples)

    // incremental persistence: each log holds one immutable dir per
    // committed batch (no accumulated-log rewrites), and only the
    // newest keyed version survives
    (0 until 3).foreach { i =>
      assert(Files.isDirectory(java.nio.file.Paths.get(s"$dirB/log/raw/batch=$i")))
    }
    assert(!Files.exists(java.nio.file.Paths.get(s"$dirB/keyed/v=0")) &&
      !Files.exists(java.nio.file.Paths.get(s"$dirB/keyed/v=1")) &&
      Files.isDirectory(java.nio.file.Paths.get(s"$dirB/keyed/v=2")))
  }
}
