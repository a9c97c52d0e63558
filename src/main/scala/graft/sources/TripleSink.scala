package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** A16: graph materialization into an Iceberg-style (subj, pred, obj)
  * triple table.
  *
  * No Iceberg runtime jar ships in this image (SURVEY.md §7 hard-part 2),
  * so the table format is emulated: hash-partitioned parquet plus a JSON
  * snapshot manifest recording schema, per-partition row counts, and a
  * deterministic content-derived snapshot id. The write path is the seam:
  * with a real Iceberg catalog configured, `writeTo(table).overwritePartitions`
  * replaces `write.partitionBy.parquet` and the manifest comes for free.
  */
object TripleSink {

  /** Writes triples + lineage columns, partitioned by part_id =
    * pmod(xxhash64(subj), nParts) — subject-hash partitioning co-locates
    * each entity's outgoing edges for downstream graph queries. */
  def write(triples: DataFrame, path: String, runId: String, nParts: Int = 32): Unit = {
    val withPart = triples
      .withColumn("part_id", pmod(xxhash64(col("subj")), lit(nParts)).cast("int"))
      .withColumn("run_id", lit(runId))
    withPart
      .repartition(col("part_id"))
      .sortWithinPartitions("subj", "pred", "obj")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_id")
      .parquet(path)

    val spark = triples.sparkSession
    val stats = spark.read.parquet(path)
      .groupBy("part_id").agg(count(lit(1)).as("rows"),
        bit_xor(xxhash64(col("subj"), col("pred"), col("obj"))).as("h"))
      .orderBy("part_id")
      .collect()
    val parts = stats.map(r =>
      s"""{"part_id":${r.getInt(0)},"rows":${r.getLong(1)}}""").mkString("[", ",", "]")
    // snapshot id derived from content, not wall clock → deterministic runs
    val snapshotId = stats.map(r => if (r.isNullAt(2)) 0L else r.getLong(2))
      .foldLeft(0L)(_ ^ _)
    val manifest =
      s"""{"format":"graft-iceberg-emulation/1","table":"triples","run_id":"$runId",
         |"snapshot_id":$snapshotId,
         |"schema":[{"name":"subj","type":"string"},{"name":"pred","type":"string"},
         |{"name":"obj","type":"string"},{"name":"part_id","type":"int"},
         |{"name":"run_id","type":"string"}],
         |"partitions":$parts}""".stripMargin.replace("\n", "")
    Files.write(Paths.get(path.stripPrefix("file:"), "_manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
  }
}
