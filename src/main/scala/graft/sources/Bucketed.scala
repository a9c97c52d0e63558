package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (pre-shuffled) table layout for shuffle-free co-located
  * joins — the storage-side half of the scale story: at 100 TB the
  * winning move for a fact↔fact equi-join that runs repeatedly is to
  * pay the shuffle ONCE at write time (`bucketBy` on the join key) so
  * every subsequent join plans with zero exchanges. Spark's planner
  * sees matching `HashPartitioning(key, n)` on both catalog tables and
  * elides both shuffle exchanges; `sortBy` additionally pre-sorts each
  * bucket file so sort-merge join can skip its sorts when each bucket
  * holds one file.
  *
  * Bucketing metadata lives in the session catalog, so the tables are
  * written via `saveAsTable` with an explicit external `path` (plain
  * `.parquet()` writes cannot carry bucket info). The in-memory
  * catalog is enough — no Hive metastore required — which is also why
  * each JVM (Verify, Bench, tests) re-registers the tables for itself.
  */
object Bucketed {

  /** Run `body` with auto-broadcast pinned off (both the static and
    * the AQE threshold), restoring each conf's EXACT prior state —
    * set values re-set, previously-unset keys unset again. The unset
    * distinction matters for `spark.sql.adaptive.autoBroadcastJoinThreshold`:
    * while unset it dynamically falls back to
    * `spark.sql.autoBroadcastJoinThreshold`, and writing its effective
    * value back as an explicit setting would freeze that link for the
    * rest of the session. `body` must fully EXECUTE any plan that needs
    * the pinned confs (collect/localCheckpoint) before returning —
    * lazy plans optimized later see the restored settings. */
  def withBroadcastOff[A](spark: SparkSession)(body: => A): A =
    withConfs(spark, Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))(body)

  /** Generic pin-confs-run-restore: sets each (key, value), runs
    * `body`, then restores each conf's exact prior state — previously
    * SET values re-set, previously UNSET keys unset again (see the
    * [[withBroadcastOff]] note on why set-vs-unset matters for
    * fallback confs). */
  def withConfs[A](spark: SparkSession, confs: Seq[(String, String)])(body: => A): A = {
    val saved = confs.map { case (k, _) =>
      k -> (if (spark.sessionState.conf.contains(k)) Some(spark.conf.get(k))
            else None)
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Write `df` as a bucketed+sorted external parquet table named
    * `name` at `dir/name`, replacing any prior registration. */
  def writeBucketed(spark: SparkSession, df: DataFrame, key: String,
                    buckets: Int, dir: String, name: String): Unit = {
    require(buckets > 0, "buckets must be positive")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite").format("parquet")
      .option("path", s"$dir/$name")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** Equi-join two DataFrames through a bucketed layout: both sides
    * are written bucketed on their join key with the SAME bucket
    * count, then joined as catalog tables. The returned join's
    * physical plan contains no Exchange (asserted in BucketingSpec) —
    * the join work is purely per-bucket, which on a cluster means
    * per-executor with no network phase. The write cost is the
    * point, not an overhead: it is the one-time shuffle that every
    * later join on this key no longer pays.
    */
  def coLocatedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String, buckets: Int,
                    dir: String,
                    leftName: String = "graft_bkt_left",
                    rightName: String = "graft_bkt_right"): DataFrame = {
    writeBucketed(spark, left, leftKey, buckets, dir, leftName)
    writeBucketed(spark, right, rightKey, buckets, dir, rightName)
    spark.table(leftName).join(spark.table(rightName),
      col(leftKey) === col(rightKey))
  }
}
