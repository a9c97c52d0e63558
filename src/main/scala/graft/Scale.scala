package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule ("throughput scaling
  * efficiency ≥ 0.8 between N and 4N executors", BASELINE.json).
  *
  * No real multi-node cluster exists in this sandbox, so the same
  * flagship job runs at two cluster sizes on this box — preferred
  * mode "cluster": local-cluster[N,8,mem] vs local-cluster[4N,8,mem]
  * (real separate executor JVMs, 8 cores each, the shape production
  * Spark uses); mode "local": local[N] vs local[4N] threads. Same
  * input at both sizes; spark.sql.shuffle.partitions scales with total
  * cores; efficiency = (T_N / T_4N) / 4. Results: BENCH.md/BASELINE.md.
  *
  * Usage: runMain graft.Scale [sfDir] [replicate] [N] [trials] [cluster|local]
  */
object Scale {

  /** `executors = 0` → local[cores] (threads in one JVM). Otherwise
    * local-cluster[executors, cores, mem] — real separate executor
    * JVMs, the faithful proxy for "N vs 4N executors": production
    * Spark runs several medium executors per node precisely because a
    * single huge-thread-count JVM stops scaling (GC stop-the-world
    * grows with mutator threads; measured on this box: 4×8-core JVMs
    * sustain full per-core speed where 1×32-thread JVM loses half). */
  private def newSession(executors: Int, cores: Int): SparkSession = {
    val totalCores = math.max(1, executors) * cores
    val execMemMb = 6144
    val b = SparkSession.builder()
      .appName(s"graft-scale-${executors}x$cores")
      .config("spark.sql.shuffle.partitions", totalCores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val withMaster =
      if (executors <= 0) b.master(s"local[$cores]")
      else b.master(s"local-cluster[$executors,$cores,$execMemMb]")
        .config("spark.executor.memory", s"${execMemMb}m")
        .config("spark.executor.extraClassPath",
          sys.props.getOrElse("graft.classes", "/root/repo/target/scala-2.13/classes"))
        .config("spark.executor.extraJavaOptions",
          "-XX:+UseParallelGC -XX:ParallelGCThreads=8")
    val s = withMaster.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One flagship pass: pages → extract → tag → triples → link → CC →
    * rewrite. ONE action only — a second count would re-run the narrow
    * chain and distort the timing. Page count is docs × replicate. */
  private def flagship(spark: SparkSession, sfDir: String, replicate: Int,
                       heavy: Int, pagesPath: Option[String]): (Long, Long) = {
    val cfg = Pipeline.Config(nParts = spark.sparkContext.defaultParallelism * 2)
    val out = pagesPath match {
      case Some(path) =>
        import spark.implicits._
        Pipeline.run(spark, spark.read.parquet(path).as[graft.sources.PageRow], cfg)
      case None => Pipeline.runOnTestdata(spark, sfDir, replicate, cfg, heavy)
    }
    val nTriples = out.triples.count()
    val nPages = pagesPath match {
      case Some(path) => spark.read.parquet(path).count() // metadata-only
      case None => spark.read.parquet(s"$sfDir/documents.parquet").count() * replicate
    }
    (nPages, nTriples)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val replicate = args.lift(1).map(_.toInt).getOrElse(8)
    val n = args.lift(2).map(_.toInt).getOrElse(8)

    val trials = args.lift(3).map(_.toInt).getOrElse(2)
    // "cluster" → N executors vs 4N executors (8 cores each, separate
    // JVMs via local-cluster); "local" → local[N] vs local[4N] threads
    val clusterMode = args.lift(4).contains("cluster")
    // page-size multiplier: heavy>1 concatenates that many fixture docs
    // per page (~250B * heavy), approximating real web-page text sizes
    val heavy = args.lift(5).map(_.toInt).getOrElse(1)
    // optional pre-materialized pages parquet (see graft.PagesGen):
    // measures the pipeline over fixed on-disk input, the WARC shape
    val pagesPath = args.lift(6)

    /** One timed pass in a fresh session for `units`. */
    def onePass(units: Int, warm: Boolean): (Double, Long, Long) = {
      val spark =
        if (clusterMode) newSession(units, 8) else newSession(0, units)
      try {
        if (warm) flagship(spark, sfDir, math.max(1, replicate / 8), heavy,
          if (pagesPath.isDefined) pagesPath else None)
        val t0 = System.nanoTime()
        val out = flagship(spark, sfDir, replicate, heavy, pagesPath)
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scale] units=$units trial=$sec%.2fs")
        (sec, out._1, out._2)
      } finally spark.stop()
    }

    // ALTERNATE the two sizes (N, 4N, N, 4N, ...) and take the min per
    // size: JIT keeps improving for minutes inside one JVM, so running
    // all N-side trials first would systematically inflate T_N (and the
    // efficiency). Alternation gives both sizes the same JIT exposure.
    var tN = Double.MaxValue
    var t4N = Double.MaxValue
    var pages = 0L
    var triples = 0L
    for (round <- 1 to trials) {
      val (a, p, t) = onePass(n, warm = round == 1)
      val (b, _, _) = onePass(4 * n, warm = round == 1)
      tN = math.min(tN, a)
      t4N = math.min(t4N, b)
      pages = p
      triples = t
    }
    val eff = (tN / t4N) / 4.0
    println(
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio","mode":"${if (clusterMode) "executors" else "threads"}","units_n":$n,"units_4n":${4 * n},"sec_n":${f"$tN%.2f"},"sec_4n":${f"$t4N%.2f"},"pages":$pages,"triples":$triples,"docs_per_sec_n":${f"${pages / tN}%.0f"},"docs_per_sec_4n":${f"${pages / t4N}%.0f"},"sf":"$sfDir","replicate":$replicate,"heavy":$heavy,"pages_path":"${pagesPath.getOrElse("")}"}""")
  }
}
