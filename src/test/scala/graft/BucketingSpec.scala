package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketed

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("coLocatedJoin == plain join, and plans ZERO exchanges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bkt").toString
    val left = (1L to 200L).map(i => (i % 50, i, s"l$i"))
      .toDF("k", "lid", "lpay")
    val right = (1L to 120L).map(i => (i % 60, i, s"r$i"))
      .toDF("rk", "rid", "rpay")

    // the fixture is tiny, so the planner would broadcast (and then
    // rightly skip the bucketed scan); force the sort-merge path the
    // layout is FOR — at real scale neither side is broadcastable
    try Bucketed.withBroadcastOff(spark) {
      val bucketed = Bucketed.coLocatedJoin(
        spark, left, right, "k", "rk", 4, dir, "bkt_spec_l", "bkt_spec_r")
      val plain = left.join(right, col("k") === col("rk"))

      // value identity vs the shuffled join
      val b = bucketed.select("lid", "rid").as[(Long, Long)].collect().toSet
      val p = plain.select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(b == p && b.nonEmpty)

      // the whole point: both scans expose HashPartitioning(key, 4), so
      // EnsureRequirements inserts NO shuffle — per-bucket join only
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join still shuffles:\n$bucketedPlan")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        "control: the non-bucketed join should need a shuffle")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_spec_l")
      spark.sql("DROP TABLE IF EXISTS bkt_spec_r")
    }
  }

  test("withBroadcastOff restores set-vs-unset state exactly") {
    val aq = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val bt = "spark.sql.autoBroadcastJoinThreshold"
    // snapshot and restore the shared session's own prior state so
    // this test is order-independent in the suite
    val aqBefore =
      if (spark.sessionState.conf.contains(aq)) Some(spark.conf.get(aq)) else None
    val btBefore = spark.conf.get(bt)
    try {
      spark.conf.unset(aq)
      Bucketed.withBroadcastOff(spark) {
        assert(spark.conf.get(bt) == "-1" && spark.conf.get(aq) == "-1")
      }
      // aq must be UNSET again, not re-pinned to an effective value:
      // the AQE planner falls back to bt only while aq is absent, so
      // writing anything back would freeze that link for the session
      assert(!spark.sessionState.conf.contains(aq))
      assert(spark.conf.get(bt) == btBefore)
    } finally aqBefore.foreach(spark.conf.set(aq, _))
  }
}
