package scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BENCH.md evidence row for the skew story (round-3 verdict item 7):
  * SkewSpec proves AQE's OptimizeSkewedJoin FIRES on a planted hot key;
  * this main measures what the split is WORTH in wall time, on a join
  * sized like the sf0.1 tables.
  *
  * Shape: a 12M-row fact with a 64-byte payload, half of it on ONE hot
  * key (~30× the bytes of a median shuffle partition at 32 partitions),
  * shuffle-joined (broadcast off — at 100 TB the dim side of a skewed
  * join is often too big to broadcast) to a 1001-key dim, then
  * aggregated over the payload so the fat column actually crosses the
  * exchange (an aggregate over keys alone would let column pruning
  * delete the skew before the shuffle). AQE defaults split the ~430 MB
  * hot partition (factor 5 × median ≈ 70 MB, floor 256 MB — both
  * cleared); with skewJoin disabled the same partition runs as one
  * straggler task.
  *
  * Protocol: JIT warm-up pass, then `rounds` alternating OFF/ON
  * measurements, min per side (same box-drift reasoning as
  * graft.Scale). One JSON line to stdout.
  */
object SkewBench {

  private val HotRows = 6000000L
  private val ColdRows = 6000000L
  private val ColdKeys = 1000L

  private def fact(spark: SparkSession, rows: Long): DataFrame = {
    val hot = spark.range(rows / 2).select(lit(1L).as("k"), col("id"))
    val cold = spark.range(rows / 2)
      .select((col("id") % ColdKeys + 2L).as("k"), col("id"))
    hot.unionByName(cold)
      // 64-byte deterministic payload — the bytes that make the hot
      // partition heavy; derived from id so nothing is constant-folded
      .withColumn("pay", sha2(concat(col("k"), lit(":"), col("id")), 256))
  }

  private def dim(spark: SparkSession): DataFrame =
    spark.range(0, ColdKeys + 2)
      .select(col("id").as("rk"), concat(lit("p"), col("id")).as("rpay"))

  /** The measured query: shuffle join + payload-consuming aggregate. */
  private def run(spark: SparkSession, rows: Long): Long = {
    val j = fact(spark, rows).join(dim(spark), col("k") === col("rk"))
      .groupBy("rk").agg(sum(length(col("pay"))).as("bytes"))
    j.count()
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
      // JIT/codegen warm-up at 1/8 scale, both conf states
      Seq("false", "true").foreach { on =>
        withConfs(spark, Seq("spark.sql.adaptive.skewJoin.enabled" -> on)) {
          run(spark, (HotRows + ColdRows) / 8)
        }
      }
      def timed(on: String): Double =
        withConfs(spark, Seq("spark.sql.adaptive.skewJoin.enabled" -> on)) {
          val t0 = System.nanoTime()
          run(spark, HotRows + ColdRows)
          (System.nanoTime() - t0) / 1e9
        }
      var off = Double.MaxValue
      var onv = Double.MaxValue
      for (r <- 1 to rounds) {
        val a = timed("false"); val b = timed("true")
        System.err.println(f"[skew] round=$r off=$a%.1fs on=$b%.1fs")
        off = math.min(off, a); onv = math.min(onv, b)
      }
      println(f"""{"metric":"skew_join_aqe_split","rows":${HotRows + ColdRows},"hot_share":0.5,"off_sec":$off%.2f,"on_sec":$onv%.2f,"speedup":${off / onv}%.2f}""")
    } finally spark.stop()
  }
}
