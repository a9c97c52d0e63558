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


    // Pre-run quiet probe: foreign busy% over an interval this JVM
    // spends asleep (any busy is other tenants), then steal% under an
    // 8-thread spin (steal only accrues with runnable threads). The
    // bounds are the round-4 pre-registered gate (BENCH.md): foreign
    // busy ≤8%, probe steal ≤2%.
    val (_, preBusy, preSteal) = HostMeter.during { Thread.sleep(1500) }
    val (_, _, probeSteal) = HostMeter.during(HostMeter.spin(8, 2000))

    val ((flagshipSec, ckptCold, ckptResume, results), runBusy, runSteal) =
      HostMeter.during(timedSection(spark, sfDir))
    val all = ("kg_flagship" -> flagshipSec) +:
      ("kg_flagship_ckpt_cold" -> ckptCold) +:
      ("kg_flagship_ckpt_resume" -> ckptResume) +: results
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = all.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = all.map(_._2).filter(_ >= 0).sum
    // Absolute single-thread spin calibration (slower cycles from
    // frequency capping / bandwidth contention show here even when the
    // steal counter is quiet; compare across runs, not to a constant).
    val calibMs = HostMeter.calibSpinMs()
    // Quiet-gate verdict, pre-registered bounds from the round-4
    // protocol (BENCH.md): pre-run foreign busy ≤8%, probe steal ≤2%,
    // steal measured DURING the timed section ≤0.35% (the closing-bench
    // accept rule). A failing run still prints its numbers — but
    // carries contaminated:true so it can never silently stand in for
    // a clean one in cross-round comparison (round 4: identical code
    // read 1.36× slower purely from neighbor contention).
    val contaminated = preBusy > 8.0 || probeSteal > 2.0 || runSteal > 0.35
    val verdict = if (contaminated) "reject" else "accept"
    println(f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"calib_spin_ms":$calibMs%.0f,"pre_busy_pct":$preBusy%.2f,"pre_steal_pct":$preSteal%.2f,"probe_steal_pct":$probeSteal%.2f,"run_busy_pct":$runBusy%.2f,"run_steal_pct":$runSteal%.2f,"contaminated":$contaminated,"quiet_gate":"$verdict","sf":"$sfDir"}""")
    spark.stop()
  }

  // A crashed query must not masquerade as a fast run: failures are
  // recorded with the -1.0 sentinel (and listed in "failed").
  private def time(body: => Long): Double = {
    val t0 = System.nanoTime()
    try { body; (System.nanoTime() - t0) / 1e9 }
    catch { case e: Throwable =>
      System.err.println(s"[bench] query FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      -1.0
    }
  }

  /** Everything the bench times, so [[HostMeter.during]] can meter host
    * busy/steal over exactly the measured interval: the flagship
    * kg-build end-to-end (pages synthesized from sfDir docs), the
    * flagship through the Lineage checkpoint machinery (A18 — a cold
    * materializing run and an immediate resume; lineage overhead vs the
    * direct flagship is cold - flagship), then every SparkEntry query. */
  private def timedSection(spark: SparkSession, sfDir: String)
      : (Double, Double, Double, Seq[(String, Double)]) = {
    val flagshipSec = time {
      Pipeline.runOnTestdata(spark, sfDir).triples.count()
    }
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
    (flagshipSec, ckptCold, ckptResume, results)
  }
}
