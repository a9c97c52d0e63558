package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketed

/** The engine's skew story has two halves and this spec pins the JOIN
  * half: for shuffle joins, AQE's OptimizeSkewedJoin splits oversized
  * partitions at runtime (asserted on a planted hot key below), so no
  * hand salting is needed or wanted there. For AGGREGATIONS, AQE
  * cannot split (a split partial group would double-count), which is
  * why the hot-key paths that aggregate — the linking node build
  * (A17), q_agg_salted — carry explicit deterministic salting instead.
  * Same rows either way; the assertion here is the PLAN, plus value
  * correctness under the split. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE splits a planted hot-key join partition (skew=true), values intact") {
    Bucketed.withConfs(spark, Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")) {
      Bucketed.withBroadcastOff(spark) {
      // hot key 1 carries 300k rows (~30x the advisory partition
      // size); 100 cold keys carry 100 rows each
      val left = spark.range(300000)
        .select(lit(1L).as("k"), col("id").as("lid"))
        .union(spark.range(10000)
          .select((col("id") % 100 + 2).as("k"), col("id").as("lid")))
      val right = spark.range(0, 102)
        .select(col("id").as("rk"), concat(lit("p"), col("id")).as("pay"))
      val j = left.join(right, col("k") === col("rk"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n$plan")
      assert(plan.contains("skewed"), s"no skewed AQEShuffleRead:\n$plan")
      // value correctness under the split: every hot row matched once
      assert(j.count() == 310000L)
      assert(j.filter(col("k") === 1).count() == 300000L)
      }
    }
  }
}
