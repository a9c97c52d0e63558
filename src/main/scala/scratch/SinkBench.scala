package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BENCH.md evidence row for the round-5 incremental-commit fix
  * (round-4 verdict "What's wrong" #1): TripleSink append commits used
  * to recompute snapshot stats over the ENTIRE visible table — so a
  * streaming append-per-micro-batch ingest paid O(table) per commit,
  * O(n²) over a stream's life. Commits now derive stats from the NEW
  * run only and fold them with the prior manifest (rows add, hashes
  * xor).
  *
  * This main demonstrates the fix the way the verdict asked: N
  * successive equal-sized appends into one table, per-append commit
  * wall time recorded. With O(table) stats the k-th append costs
  * ~k×the first (the table holds k batches when batch k commits);
  * with incremental stats the trend is FLAT. We report the
  * late/early cost ratio — mean of the last quarter over mean of
  * the 2nd quarter (the 1st quarter is excluded from the base as JIT
  * warm-up) — which would be ≥2.5 under the old quadratic path at
  * nAppends=24 and ~1.0 now. A final statsAudit recomputes stats over
  * the full table and asserts the folded manifest is exact, so the
  * speed does not come from dropping the integrity the stats exist
  * for. One JSON line to stdout.
  */
object SinkBench {

  def main(args: Array[String]): Unit = {
    val nAppends = if (args.nonEmpty) args(0).toInt else 24
    val rowsPerBatch = if (args.length > 1) args(1).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = java.nio.file.Files.createTempDirectory("graft-sinkbench").toString
    def batch(i: Int) = spark.range(rowsPerBatch)
      .select(
        concat(lit(s"e${i}_"), col("id")).as("subj"),
        lit("linksTo").as("pred"),
        sha2(concat(lit(i), col("id")), 256).as("obj"))

    // JIT/codegen warm-up on a throwaway table
    val warm = java.nio.file.Files.createTempDirectory("graft-sinkbench-warm").toString
    graft.sources.TripleSink.write(batch(0), warm, "w0", nParts = 16)
    graft.sources.TripleSink.write(batch(1), warm, "w1", nParts = 16, append = true)

    val secs = (0 until nAppends).map { i =>
      val t0 = System.nanoTime()
      graft.sources.TripleSink.write(batch(i), path, f"b$i%03d",
        nParts = 16, append = i > 0)
      (System.nanoTime() - t0) / 1e9
    }
    require(graft.sources.TripleSink.statsAudit(spark, path),
      "incremental manifest stats diverged from full recompute")
    val total = graft.sources.TripleSink.snapshots(path).last._3
    require(total == nAppends * rowsPerBatch, s"row count drifted: $total")

    val q = nAppends / 4
    val early = secs.slice(q, 2 * q)
    val late = secs.takeRight(q)
    val ratio = (late.sum / late.size) / (early.sum / early.size)
    println(s"""{"bench":"sink_append_cost","n_appends":$nAppends,""" +
      s""""rows_per_batch":$rowsPerBatch,""" +
      s""""per_append_sec":${secs.map(s => f"$s%.3f").mkString("[", ",", "]")},""" +
      f""""late_over_early":$ratio%.3f,"flat":${ratio < 1.3}}""")

    Seq(path, warm).foreach { p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    }
    spark.stop()
  }
}
