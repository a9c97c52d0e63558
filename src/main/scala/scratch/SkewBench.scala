package scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BENCH.md evidence row for the skew story (round-3 verdict item 7):
  * SkewSpec proves AQE's OptimizeSkewedJoin FIRES on a planted hot key;
  * this main measures what the split is WORTH in wall time, on a join
  * sized like the sf0.1 tables.
  *
  * Shape: a 12M-row parquet fact with an incompressible 64-byte
  * payload, half of it on ONE hot key (~30× the rows of a median
  * shuffle partition at 32 partitions), shuffle-joined (broadcast off
  * — at 100 TB the dim side of a skewed join is often too big to
  * broadcast) to a 1001-key dim, then aggregated over the payload so
  * the fat column actually crosses the exchange (an aggregate over
  * keys alone would let column pruning delete the skew before the
  * shuffle). With skewJoin disabled the hot partition runs as one
  * straggler reducer; enabled, it splits into advisory-sized pieces.
  * Every ON-side plan is asserted to contain `skew=true` and every
  * OFF-side plan to lack it, so the bench cannot silently measure
  * nothing (two designs that did are documented inline below).
  *
  * Protocol: JIT warm-up pass, then `rounds` alternating OFF/ON
  * measurements, min per side (same box-drift reasoning as
  * graft.Scale). One JSON line to stdout.
  */
object SkewBench {

  private val HotRows = 6000000L
  private val ColdRows = 6000000L
  private val ColdKeys = 1000L

  /** The fact is MATERIALIZED to parquet before timing starts: sha2
    * payload synthesis is embarrassingly parallel and, timed inline,
    * drowns the skewed-shuffle signal (measured: on/off collapsed to a
    * 1.06× non-result). The timed region is read → shuffle join → agg,
    * which is the stage AQE's split actually operates on. The 64-hex
    * sha payload is deliberately incompressible so the hot partition
    * stays heavy (~300 MB) AFTER shuffle-write lz4. */
  private def writeFact(spark: SparkSession, rows: Long, path: String): Unit = {
    val hot = spark.range(rows / 2).select(lit(1L).as("k"), col("id"))
    val cold = spark.range(rows / 2)
      .select((col("id") % ColdKeys + 2L).as("k"), col("id"))
    hot.unionByName(cold)
      .withColumn("pay", sha2(concat(col("k"), lit(":"), col("id")), 256))
      .repartition(32)
      .write.mode("overwrite").parquet(path)
  }

  private def dim(spark: SparkSession): DataFrame =
    spark.range(0, ColdKeys + 2)
      .select(col("id").as("rk"), concat(lit("p"), col("id")).as("rpay"))

  /** The measured query: shuffle join + payload-consuming GLOBAL
    * aggregate. Global (not per-key): a groupBy(rk) downstream would
    * reuse the join's hash partitioning, and OptimizeSkewedJoin
    * declines to split when splitting would force an extra exchange
    * (forceOptimizeSkewedJoin=false default) — measured as a 1.00×
    * non-result. A global agg imposes no partitioning requirement, so
    * the split is free to fire; the payload still crosses the join
    * exchange and is still consumed. */
  private def run(spark: SparkSession, factPath: String): (Long, String) = {
    val j = spark.read.parquet(factPath)
      .join(dim(spark), col("k") === col("rk"))
      .agg(sum(length(col("pay"))).as("bytes"))
    // collect j ITSELF (first() would execute a separate limited plan,
    // leaving j's own adaptive plan unfinalized and the skew
    // annotation invisible)
    val v = j.collect()(0).getLong(0)
    val plan = j.queryExecution.executedPlan.toString
    (v, if (plan.contains("skew=true")) "skew=true" else "no-split")
  }

  private def withConfs[A](spark: SparkSession, confs: Seq[(String, String)])(f: => A): A =
    graft.sources.Bucketed.withConfs(spark, confs)(f)

  def main(args: Array[String]): Unit = {
    val rounds = args.lift(0).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .appName("graft-skew-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val factPath = java.nio.file.Files
        .createTempDirectory("graft_skew_fact").toString
      val warmPath = java.nio.file.Files
        .createTempDirectory("graft_skew_warm").toString
      writeFact(spark, HotRows + ColdRows, factPath)
      writeFact(spark, (HotRows + ColdRows) / 8, warmPath)
      // JIT/codegen warm-up at 1/8 scale, both conf states
      Seq("false", "true").foreach { on =>
        withConfs(spark, Seq("spark.sql.adaptive.skewJoin.enabled" -> on)) {
          run(spark, warmPath)._1
        }
      }
      // Skew DETECTION thresholds scaled to the bench's partition
      // sizes (the ~300 MB compressed hot partition sits under the
      // 256 MB default floor after lz4): at 100 TB real partitions are
      // GBs and the defaults fire as-is; the measured effect — one
      // straggler reducer vs advisory-sized splits — is the same
      // phenomenon at either scale. OFF differs ONLY in
      // skewJoin.enabled.
      def confsFor(on: String) = Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> on,
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
      def timed(on: String): (Double, String) =
        withConfs(spark, confsFor(on)) {
          val t0 = System.nanoTime()
          val (_, split) = run(spark, factPath)
          ((System.nanoTime() - t0) / 1e9, split)
        }
      var off = Double.MaxValue
      var onv = Double.MaxValue
      for (r <- 1 to rounds) {
        val (a, sa) = timed("false"); val (b, sb) = timed("true")
        System.err.println(f"[skew] round=$r off=$a%.1fs ($sa) on=$b%.1fs ($sb)")
        require(sa == "no-split" && sb == "skew=true",
          s"bench invalid: off=$sa on=$sb — the split must fire exactly on the ON side")
        off = math.min(off, a); onv = math.min(onv, b)
      }
      println(f"""{"metric":"skew_join_aqe_split","rows":${HotRows + ColdRows},"hot_share":0.5,"off_sec":$off%.2f,"on_sec":$onv%.2f,"speedup":${off / onv}%.2f}""")
    } finally spark.stop()
  }
}
