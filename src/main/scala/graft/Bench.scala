package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times the flagship kg-build plus every
  * SparkEntry query on SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":...,"value":total_sec,"unit":"sec","queries":{...},"sf":...}.
  *
  * Scaling-efficiency evidence (N vs 4N cores) is produced by the
  * separate graft.Scale main and recorded in BENCH.md / BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A crashed query must not masquerade as a fast run: failures are
    // recorded with the -1.0 sentinel (and listed in "failed").
    def time(body: => Long): Double = {
      val t0 = System.nanoTime()
      try { body; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] query FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        -1.0
      }
    }

    // flagship kg-build end-to-end (pages synthesized from sfDir docs)
    val flagshipSec = time {
      Pipeline.runOnTestdata(spark, sfDir).triples.count()
    }
    // flagship through the Lineage checkpoint machinery (A18): a cold
    // run (every stage materializes + commits, input fingerprints on)
    // and an immediate resume (all partitions committed and fresh →
    // the pipeline re-reads materialized stages; the cost measured is
    // the fingerprint passes + lineage bookkeeping). The lineage
    // overhead vs the direct flagship is cold - flagship.
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-bench-ckpt")
    def ckptRun(): Long = Pipeline.runOnTestdata(spark, sfDir, 1,
      Pipeline.Config(checkpointDir = Some(ckptDir.toString))).triples.count()
    val ckptCold = time(ckptRun())
    val ckptResume = time(ckptRun())
    scala.util.Using.resource(java.nio.file.Files.walk(ckptDir)) { files =>
      files.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> time(fn(spark, sfDir).count())
    }
    val all = ("kg_flagship" -> flagshipSec) +:
      ("kg_flagship_ckpt_cold" -> ckptCold) +:
      ("kg_flagship_ckpt_resume" -> ckptResume) +: results
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = all.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = all.map(_._2).filter(_ >= 0).sum
    // Host-calibration fields (HostMeter): absolute single-thread spin
    // time, plus steal% during an 8-thread probe — cross-round bench
    // comparisons on this shared box are meaningless without them
    // (round 4 measured identical code 1.36× slower purely from
    // neighbor contention; BENCH.md "the box, not the code").
    val calibMs = HostMeter.calibSpinMs()
    val (_, _, stealPct) = HostMeter.during(HostMeter.spin(8, 2000))
    println(f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"calib_spin_ms":$calibMs%.0f,"calib_steal_pct":$stealPct%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
