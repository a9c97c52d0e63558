package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A14: connected components via alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014 — public algorithm), expressed entirely as DataFrame
  * joins/aggregations.
  *
  * Why this and not label propagation: converges in O(log n) rounds on
  * any graph (label propagation is O(diameter)); and why no GraphX /
  * GraphFrames: no GraphFrames jar ships in this image and GraphX is
  * RDD-based, which BASELINE.json:15 forbids unless forced.
  *
  * Scale notes: neighbor minima are computed with groupBy().min — a
  * partial-aggregation-friendly shape (map-side combine absorbs hot
  * nodes; no collect_list skew). Each iteration `localCheckpoint`s the
  * edge set to truncate the growing Catalyst lineage (SURVEY §4), and
  * convergence is detected by a (count, sum-of-row-hash) fingerprint —
  * one cheap aggregate instead of an exceptAll anti-join.
  */
object ConnectedComponents {

  /** Reliable-checkpoint option for the iterative loop. localCheckpoint
    * (the default) stores blocks on executors only — fastest on a
    * single box, but on a real cluster a lost executor mid-loop kills
    * the job (no lineage survives to recompute from). With `Reliable`,
    * every `every`-th iteration (and the initial edge set) instead
    * writes parquet under `dir` and reads it back — durable on the
    * cluster's shared FS (HDFS/S3) — and a re-invocation of [[run]]
    * with the same `dir` RESUMES from the newest committed iteration
    * (its `_SUCCESS` marker is the commit point), so a job-level retry
    * after any failure — including executor loss on one of the
    * localCheckpoint'd iterations between two reliable pins — loses at
    * most `every - 1` rounds of work, not the whole loop.
    *
    * Contract: `dir` identifies ONE logical run over ONE edge set
    * (like a Spark checkpoint dir). Reusing it across different inputs
    * resumes from the previous input's state by design — callers that
    * want a fresh computation must pass a fresh/cleaned dir. Use
    * localCheckpoint for single-box / short loops where whole-loop
    * retry is acceptable; Reliable for long loops on clusters. Earlier
    * iteration dirs are deleted as the loop advances; the LAST dir
    * backs the returned (lazy) DataFrame, so `dir` must outlive
    * consumption of the result. */
  final case class Reliable(dir: String, every: Int = 3)

  /** edges: DataFrame(src: long, dst: long), undirected (either order,
    * duplicates fine). Returns DataFrame(id: long, comp: long) covering
    * every endpoint; comp = min node id of the component.
    *
    * Size-adaptive: when the deduplicated edge set fits comfortably on
    * the driver (≤ localThreshold rows), a driver-side union-find
    * replaces the iterative joins — the iterative loop costs ~6 stage
    * barriers per round, pure serial latency that Amdahl-caps scaling
    * when the entity graph is orders of magnitude smaller than the
    * corpus (it always is: |entities| ≪ |pages|). Both paths produce
    * identical output (CcSpec asserts it); set localThreshold = 0 to
    * force the distributed path. */
  def run(edges: DataFrame, maxIter: Int = 25,
          localThreshold: Long = 1L << 20,
          reliable: Option[Reliable] = None): DataFrame = {
    val spark = edges.sparkSession

    // resume-from-checkpoint: a committed cc-iter-N under the reliable
    // dir means a previous invocation over this dir's edge set got that
    // far — continue from it instead of recomputing from the raw edges
    // (see the Reliable contract above; `dir` is per-logical-run)
    reliable.flatMap(r => latestCommittedIter(spark, r.dir)) match {
      case Some((it, pinned)) =>
        return runDistributed(pinned, maxIter, reliable, startIter = it)
      case None => ()
    }

    // canonical undirected form (u > v), self-loops dropped
    val canonical = edges
      .select(greatest(col("src"), col("dst")).as("u"),
              least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    if (localThreshold <= 0)
      return runDistributed(pin(canonical, 0, reliable), maxIter, reliable)

    // persist before the size probe so the (possibly expensive)
    // upstream edge generation runs once, not once for the count and
    // again for the collect / first iteration
    canonical.persist(StorageLevel.MEMORY_AND_DISK)
    if (canonical.count() <= localThreshold) {
      val out = runLocal(canonical)
      canonical.unpersist()
      out
    } else {
      val e0 = pin(canonical, 0, reliable)
      canonical.unpersist()
      runDistributed(e0, maxIter, reliable)
    }
  }

  /** Materialize an iteration's edge set and truncate its lineage:
    * parquet write-read on reliable iterations, localCheckpoint
    * otherwise. Both bound the growing Catalyst plan; only the former
    * survives executor loss. */
  private def pin(df: DataFrame, iter: Int, reliable: Option[Reliable]): DataFrame =
    reliable match {
      case Some(r) if iter % math.max(1, r.every) == 0 =>
        val path = s"${r.dir}/cc-iter-$iter"
        df.write.mode("overwrite").parquet(path)
        val out = df.sparkSession.read.parquet(path)
        // earlier iterations are superseded; keep only the newest dir
        deleteDirsBefore(r.dir, iter)
        out
      case _ => df.localCheckpoint(true)
    }

  /** Newest `cc-iter-N` under `dir` that finished its write (Spark's
    * `_SUCCESS` marker is the commit point — a crash mid-write leaves
    * no marker and the dir is ignored). Local-FS listing, like
    * [[deleteDirsBefore]]; the parquet read itself is Spark-native. */
  private def latestCommittedIter(spark: SparkSession,
                                  dir: String): Option[(Int, DataFrame)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir.stripPrefix("file:"))
    if (!java.nio.file.Files.isDirectory(root)) return None
    val iters = scala.util.Using.resource(java.nio.file.Files.list(root)) { s =>
      s.iterator().asScala.flatMap { p =>
        val name = p.getFileName.toString
        if (name.startsWith("cc-iter-") &&
            java.nio.file.Files.exists(p.resolve("_SUCCESS")))
          name.stripPrefix("cc-iter-").toIntOption
        else None
      }.toList
    }
    iters.sorted.lastOption.map { it =>
      (it, spark.read.parquet(s"$dir/cc-iter-$it"))
    }
  }

  /** Local-FS cleanup of superseded iteration dirs (the sandbox shape;
    * a cluster deployment swaps this one call for Hadoop
    * FileSystem.delete — the write-read pinning above already goes
    * through Spark and works on HDFS/S3 unchanged). */
  private def deleteDirsBefore(dir: String, iter: Int): Unit = {
    val root = java.nio.file.Paths.get(dir.stripPrefix("file:"))
    if (java.nio.file.Files.isDirectory(root)) {
      scala.util.Using.resource(java.nio.file.Files.list(root)) { listing =>
        listing.forEach { p =>
          val name = p.getFileName.toString
          if (name.startsWith("cc-iter-") &&
              name.stripPrefix("cc-iter-").toIntOption.exists(_ < iter)) {
            scala.util.Using.resource(java.nio.file.Files.walk(p)) { files =>
              files.sorted(java.util.Comparator.reverseOrder())
                .forEach(f => java.nio.file.Files.deleteIfExists(f))
            }
          }
        }
      }
    }
  }

  private def runDistributed(first: DataFrame, maxIter: Int,
                             reliable: Option[Reliable] = None,
                             startIter: Int = 0): DataFrame = {
    var e = first

    var fp = fingerprint(e)
    var converged = false
    var iter = startIter
    while (!converged && iter < maxIter) {
      val ls = largeStar(e)
      val ss = smallStar(ls)
      val next = pin(ss, iter + 1, reliable)
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      e.unpersist()
      e = next
      iter += 1
    }

    // After convergence the edge set is a star forest: every edge is
    // (node, root). Roots map to themselves.
    val nonRoots = e.groupBy(col("u").as("id")).agg(min("v").as("comp"))
    val roots = e.select(col("v").as("id")).distinct()
      .join(nonRoots, Seq("id"), "left_anti")
      .withColumn("comp", col("id"))
    nonRoots.unionByName(roots)
  }

  /** Driver-side union-find over a collected edge list (the adaptive
    * small-graph path). Path-halving + union-by-min keeps comp = min id,
    * matching the distributed algorithm's output exactly. */
  private def runLocal(canonical: DataFrame): DataFrame = {
    val spark = canonical.sparkSession
    import spark.implicits._
    val es = canonical.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    es.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    es.foreach { case (a, b) =>
      out += ((a, find(a)))
      out += ((b, find(b)))
    }
    out.distinct.toSeq.toDF("id", "comp")
  }

  /** Large-star: for each node u, connect every strictly-larger neighbor
    * to min(N(u) ∪ {u}). Input/output: canonical (u > v) edges. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e.select(col("v").as("a"), col("u").as("b")))
    val minNbr = sym.groupBy("a").agg(min("b").as("mn"))
    sym.join(minNbr, "a")
      .filter(col("b") > col("a")) // strictly larger neighbors
      .select(col("b").as("u"), least(col("mn"), col("a")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: for each node u over its smaller-or-equal neighbors,
    * connect all of them (and u) to the minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val minNbr = e.groupBy("u").agg(min("v").as("mn")) // all v < u ⇒ mn < u
    val moved = e.join(minNbr, "u")
      .filter(col("v") =!= col("mn"))
      .select(col("v").as("u"), col("mn").as("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    moved.unionByName(minNbr.select(col("u"), col("mn").as("v")))
      .distinct()
  }

  private def fingerprint(e: DataFrame): (Long, Long) = {
    // bit_xor, not sum: order-independent and cannot overflow under ANSI mode
    val row = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }
}
