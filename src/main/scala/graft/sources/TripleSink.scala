package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A16: graph materialization into an Iceberg-style (subj, pred, obj)
  * triple table, with SNAPSHOTS and time-travel reads.
  *
  * No Iceberg runtime jar ships in this image (SURVEY.md §7 hard-part 2),
  * so the table format is emulated with the same separation Iceberg
  * uses — immutable data files + a manifest per commit:
  *
  * {{{
  *   <path>/data/run=<runId>/part_id=N/  -- data files per commit
  *   <path>/_manifests/manifest-<seq>-<runId>.json  -- one per snapshot
  *   <path>/_manifest.json               -- copy of the LATEST manifest
  * }}}
  *
  * Each manifest records which runs' data directories are VISIBLE in
  * that snapshot (`visible_runs`): an `overwrite` commit replaces the
  * logical table (visible = just itself) while an `append` commit adds
  * to the previous snapshot's visibility — but either way earlier data
  * files are RETAINED, which is exactly what makes [[readAsOf]] (read
  * the table as it stood at a prior run) possible. With a real Iceberg
  * catalog configured, `writeTo(table)` + `VERSION AS OF` replace this
  * file plumbing and nothing upstream changes.
  */
object TripleSink {

  /** Commits triples as a new snapshot: data files land under
    * `path/data/run=<runId>` partitioned by part_id =
    * pmod(xxhash64(subj), nParts) — subject-hash partitioning
    * co-locates each entity's outgoing edges for downstream graph
    * queries — and a new manifest makes the commit visible.
    * `append = false` (default) gives overwrite semantics: the new
    * snapshot's visible data is this run alone; `append = true` unions
    * it with the previous snapshot's. Re-committing an existing runId
    * replaces that run's data files (idempotent retry). */
  def write(triples: DataFrame, path: String, runId: String,
            nParts: Int = 32, append: Boolean = false): Unit = {
    val dataDir = s"$path/data/run=$runId"
    triples
      .withColumn("part_id", pmod(xxhash64(col("subj")), lit(nParts)).cast("int"))
      .withColumn("run_id", lit(runId))
      .repartition(col("part_id"))
      .sortWithinPartitions("subj", "pred", "obj")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_id")
      .parquet(dataDir)

    val spark = triples.sparkSession
    val prior = manifests(path).lastOption
    val prevVisible = prior.map(m => visibleRuns(path, m)).getOrElse(Nil)
    val visible =
      if (append) (prevVisible :+ runId).distinct else Seq(runId)
    val seq = prior.map(_._1 + 1).getOrElse(0)

    // snapshot stats over the snapshot's VISIBLE data (what a reader
    // of this snapshot sees), not just the new files
    val stats = readRuns(spark, path, visible)
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
      s"""{"format":"graft-iceberg-emulation/2","table":"triples","seq":$seq,
         |"run_id":"$runId","operation":"${if (append) "append" else "overwrite"}",
         |"snapshot_id":$snapshotId,
         |"visible_runs":${visible.map(r => s""""$r"""").mkString("[", ",", "]")},
         |"schema":[{"name":"subj","type":"string"},{"name":"pred","type":"string"},
         |{"name":"obj","type":"string"},{"name":"part_id","type":"int"},
         |{"name":"run_id","type":"string"}],
         |"partitions":$parts}""".stripMargin.replace("\n", "")
    val mdir = root(path).resolve("_manifests")
    Files.createDirectories(mdir)
    // zero-padded seq so lexicographic listing order == commit order
    Files.write(mdir.resolve(f"manifest-$seq%06d-$runId.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // latest-manifest copy at the table root (convenience + back-compat)
    Files.write(root(path).resolve("_manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
  }

  /** The table as of its LATEST snapshot. */
  def read(spark: SparkSession, path: String): DataFrame =
    manifests(path).lastOption match {
      case Some(m) => readRuns(spark, path, visibleRuns(path, m))
      case None => throw new IllegalArgumentException(
        s"no committed snapshot under $path")
    }

  /** Time travel: the table exactly as it stood when `runId` committed
    * — later overwrites/appends do not affect the result, because the
    * data files each snapshot references are immutable. If the same
    * runId committed more than once (idempotent retry), the newest of
    * its manifests wins. */
  def readAsOf(spark: SparkSession, path: String, runId: String): DataFrame =
    manifests(path).filter(_._2 == runId).lastOption match {
      case Some(m) => readRuns(spark, path, visibleRuns(path, m))
      case None => throw new IllegalArgumentException(
        s"no snapshot for run_id=$runId under $path")
    }

  /** Snapshot log, oldest first: (seq, run_id, total_rows). */
  def snapshots(path: String): Seq[(Int, String, Long)] =
    manifests(path).map { case (seq, runId, file) =>
      val body = new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      val rows = """"rows":(\d+)""".r.findAllMatchIn(body)
        .map(_.group(1).toLong).sum
      (seq, runId, rows)
    }

  /** Table maintenance 1 of 2 — snapshot expiration (Iceberg's
    * `expireSnapshots`): drop all but the newest `keepLast` manifests,
    * then garbage-collect every data directory no SURVIVING snapshot
    * references. Retention is what bounds a 10^12-row table's storage:
    * without it every overwrite retains its predecessor's files
    * forever. Time travel to an expired snapshot becomes a clean
    * error; `read` (the latest snapshot) is never affected. Returns
    * (manifests deleted, data run-dirs deleted). */
  def expireSnapshots(path: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val all = manifests(path)
    val (expire, keep) = all.splitAt(math.max(0, all.size - keepLast))
    val live = keep.flatMap(m => visibleRuns(path, m)).toSet
    expire.foreach(m => Files.delete(m._3))
    val dataDir = root(path).resolve("data")
    val dead: Seq[Path] = if (!Files.isDirectory(dataDir)) Nil else {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.list(dataDir)) { s =>
        s.iterator().asScala.filter { p =>
          val name = p.getFileName.toString
          name.startsWith("run=") && !live.contains(name.stripPrefix("run="))
        }.toList
      }
    }
    dead.foreach(deleteRecursively)
    (expire.size, dead.size)
  }

  /** Table maintenance 2 of 2 — data-file compaction (Iceberg's
    * `rewriteDataFiles`): materialize the LATEST snapshot as one new
    * overwrite commit, collapsing the accumulated per-append run
    * directories (and their small files) back to `nParts` sorted
    * files. Values are untouched — the new snapshot reads identically
    * — and history is preserved: earlier snapshots stay time-travelable
    * until [[expireSnapshots]] reclaims them. At 10^12 rows this is
    * the periodic job that keeps file counts (and scan-planning cost)
    * bounded under a steady append stream. */
  def compact(spark: SparkSession, path: String, runId: String,
              nParts: Int = 32): Unit =
    write(read(spark, path), path, runId, nParts, append = false)

  // ---- internals -----------------------------------------------------

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p))
      scala.util.Using.resource(Files.list(p))(_.iterator().asScala.toList)
        .foreach(deleteRecursively)
    Files.delete(p)
  }

  private def root(path: String): Path = Paths.get(path.stripPrefix("file:"))

  /** Committed manifests, oldest first: (seq, run_id, file). */
  private def manifests(path: String): Seq[(Int, String, Path)] = {
    import scala.jdk.CollectionConverters._
    val mdir = root(path).resolve("_manifests")
    if (!Files.isDirectory(mdir)) return Nil
    scala.util.Using.resource(Files.list(mdir)) { s =>
      s.iterator().asScala.flatMap { p =>
        val name = p.getFileName.toString
        // manifest-<seq>-<runId>.json
        val m = """manifest-(\d+)-(.+)\.json""".r
        name match {
          case m(seq, runId) => Some((seq.toInt, runId, p))
          case _ => None
        }
      }.toList.sortBy(_._1)
    }
  }

  /** The visible_runs list recorded in a manifest. */
  private def visibleRuns(path: String, m: (Int, String, Path)): Seq[String] = {
    val body = new String(Files.readAllBytes(m._3), StandardCharsets.UTF_8)
    """"visible_runs":\[([^\]]*)\]""".r.findFirstMatchIn(body) match {
      case Some(g) =>
        g.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
      case None => Seq(m._2)
    }
  }

  /** Union-read the data directories of the given runs. Each run dir
    * was written with partitionBy("part_id"), so the column comes back
    * from the directory layout; run_id is a data column. `basePath` is
    * required when reading several `run=` directories at once —
    * without it Spark's partition discovery sees conflicting roots
    * (CONFLICTING_DIRECTORY_STRUCTURES); with it both `run` and
    * `part_id` resolve as partitions of the common base, and the
    * synthetic `run` directory column is dropped in favor of the
    * `run_id` data column the write path embeds. */
  private def readRuns(spark: SparkSession, path: String,
                       runs: Seq[String]): DataFrame = {
    require(runs.nonEmpty, "snapshot with no visible runs")
    spark.read.option("basePath", s"$path/data")
      .parquet(runs.map(r => s"$path/data/run=$r"): _*)
      .drop("run")
  }
}
