package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.bandJoin
import graft.operators.Temporal
import graft.plans.BandJoinRewrite

/** The graft_band_join marker predicate + BandJoinRewrite optimizer
  * rule: (1) the marker alone is a correct evaluable predicate (BNLJ
  * plan, brute-force oracle); (2) with the rule registered the result
  * is identical and the physical plan has no nested-loop join; (3) the
  * rewrite agrees with the hand-composed Temporal.bandJoinBackward;
  * (4) edge cases that stress the truncation-division bucketing:
  * band-edge equality, pre-1970 micros, the double-width bucket at
  * epoch zero, nulls, extra conjuncts, swapped argument orientation.
  */
class BandJoinRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // left: 6 probes, incl. one exactly at epoch 0 and one pre-1970 (the
  // truncation-toward-zero corner the bucket doc reasons about)
  private lazy val leftRows = Seq(
    (1L, ts("2024-03-01 10:00:00")),
    (2L, ts("2024-03-01 10:02:00")),
    (3L, ts("1970-01-01 00:00:00")),
    (4L, ts("1969-12-31 23:59:30")),
    (5L, ts("1969-12-31 23:58:00.000001")),
    (6L, null.asInstanceOf[Timestamp]))
  private lazy val rightRows = Seq(
    (101L, ts("2024-03-01 09:58:00")),   // exactly lt1 - 120s: in band
    (102L, ts("2024-03-01 09:57:59.999999")), // 1 micro outside
    (103L, ts("2024-03-01 10:00:00")),   // exactly lt1: in band
    (104L, ts("2024-03-01 10:00:00.000001")), // after lt1, within lt2's band
    (105L, ts("1969-12-31 23:58:30")),   // in band of 3 and 4
    (106L, ts("1969-12-31 23:56:00.000001")), // exactly lt5 - 120s
    (107L, ts("1970-01-01 00:00:01")),   // after everything pre-1970
    (108L, null.asInstanceOf[Timestamp]))

  private def l: DataFrame = {
    import spark.implicits._
    leftRows.toDF("lid", "lt")
  }
  private def r: DataFrame = {
    import spark.implicits._
    rightRows.toDF("rid", "rt")
  }

  /** Brute-force expected pair set at micros precision. */
  private def expectedPairs(band: Long): Set[(Long, Long)] =
    (for {
      (lid, lt) <- leftRows if lt != null
      (rid, rt) <- rightRows if rt != null
      ltu = lt.getTime * 1000 + (lt.getNanos / 1000) % 1000
      rtu = rt.getTime * 1000 + (rt.getNanos / 1000) % 1000
      if rtu <= ltu && rtu >= ltu - band * 1000000L
    } yield (lid, rid)).toSet

  private def got(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(BandJoinRewrite)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("marker predicate alone (no rule): correct vs brute force") {
    spark.experimental.extraOptimizations = Nil
    val j = l.join(r, bandJoin(col("lt"), col("rt"), 120L))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(got(j) == expectedPairs(120L))
  }

  test("with rule: identical rows, no nested-loop join in the plan") {
    withRule {
      val j = l.join(r, bandJoin(col("lt"), col("rt"), 120L))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("Generate"), "expected the two-bucket explode")
      assert(got(j) == expectedPairs(120L))
    }
  }

  test("rewrite agrees with Temporal.bandJoinBackward on testdata-shaped events") {
    import spark.implicits._
    // deterministic synthetic stream with heavy bucket-boundary traffic
    val ev = (0 until 4000).map { i =>
      (i.toLong, new Timestamp(1700000000000L + (i.toLong * 37199) % 7200000))
    }.toDF("id", "t")
    val purchases = ev.filter(col("id") % 7 === 0)
      .select(col("id").as("lid"), col("t").as("lt"))
    val clicks = ev.filter(col("id") % 7 =!= 0)
      .select(col("id").as("rid"), col("t").as("rt"))
    val composed = Temporal.bandJoinBackward(purchases, clicks, "lt", "rt", 60L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val ruled = withRule {
      got(purchases.join(clicks, bandJoin(col("lt"), col("rt"), 60L)))
    }
    assert(ruled == composed && composed.nonEmpty)
  }

  test("swapped orientation and extra conjuncts are preserved") {
    withRule {
      // marker's leftTime lives on the join's RIGHT child; extra
      // conjunct filters to odd rid
      val j = r.join(l, bandJoin(col("lt"), col("rt"), 120L) && col("rid") % 2 === 1)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"swap did not rewrite:\n$plan")
      assert(got(j.select("lid", "rid")) ==
        expectedPairs(120L).filter(_._2 % 2 == 1))
    }
  }

  test("band = 0 skips the rewrite but stays correct") {
    withRule {
      val j = l.join(r, bandJoin(col("lt"), col("rt"), 0L))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(got(j) == expectedPairs(0L))
    }
  }

  test("SQL registration: graft_band_join usable and rewritten in SQL") {
    val (_, info, builder) = graft.functions.GraftBandJoin.descriptor
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_band_join"), info, builder)
    l.createOrReplaceTempView("bj_l")
    r.createOrReplaceTempView("bj_r")
    withRule {
      val j = spark.sql(
        "SELECT lid, rid FROM bj_l JOIN bj_r ON graft_band_join(lt, rt, 120)")
      assert(!j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(got(j) == expectedPairs(120L))
    }
  }
}
