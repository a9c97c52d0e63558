package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** Temporal join operators vs brute-force theta-join references
  * computed on the same session — adversarial timestamps included
  * (exact band edges, bucket boundaries, sub-second fractions, ties). */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinBackward == brute-force latest-at-or-before per key") {
    import spark.implicits._
    // seeded random events/quotes; keys with zero, one and many rights
    val rnd = new scala.util.Random(7)
    val lefts = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(8).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L))
    }.toDF("event_id", "k", "t")
    val rights = (1 to 120).map { j =>
      (rnd.nextInt(6).toLong, // keys 6,7 never matched
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        j.toLong)
    }.toDF("rk", "rt", "payload")
      // tie-break right rows sharing (key, time) deterministically
      .groupBy("rk", "rt").agg(max("payload").as("payload"))

    val got = Temporal.asofJoinBackward(lefts, rights,
        "k", "t", "rk", "rt", Seq("payload", "rt"))
      .select("event_id", "payload", "rt")

    val brute = lefts.join(rights, col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(col("rt").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("event_id", "payload", "rt")

    assert(got.count() == 300)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
    // at least one left row genuinely unmatched, so the null path ran
    assert(got.filter(col("payload").isNull).count() > 0)
  }

  test("asof: right row exactly AT the left time is visible (>= semantics)") {
    import spark.implicits._
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "k", "t")
    val r = Seq((10L, ts("2024-01-01 10:00:00"), 42L)).toDF("rk", "rt", "payload")
    val out = Temporal.asofJoinBackward(l, r, "k", "t", "rk", "rt", Seq("payload"))
    assert(out.select("payload").as[Long].head() == 42L)
  }

  test("asof: payload inheritance is row-atomic — a NULL field must NOT fall through to an older right row") {
    import spark.implicits._
    // right at t=1 has (a=10, b=20); right at t=2 has (a=30, b=NULL).
    // A left row at t=3 must inherit EXACTLY the t=2 row: (30, NULL) —
    // a per-column last(ignoreNulls) would stitch (30, 20), a right
    // row that never existed
    val r = Seq(
      (10L, ts("2024-01-01 10:00:01"), Some(10L), Some(20L)),
      (10L, ts("2024-01-01 10:00:02"), Some(30L), Option.empty[Long])
    ).toDF("rk", "rt", "a", "b")
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:03"))).toDF("event_id", "k", "t")
    val out = Temporal.asofJoinBackward(l, r, "k", "t", "rk", "rt", Seq("a", "b"))
      .select("a", "b").head()
    assert(out.getLong(0) == 30L && out.isNullAt(1),
      s"expected (30, null), got $out")
  }

  test("bandJoinBackward == brute-force theta join, incl. edges and fractions") {
    import spark.implicits._
    val band = 120L
    val base = 1700000000000L
    val rnd = new scala.util.Random(11)
    // adversarial: exact band edge (t - 120s), exact bucket boundaries,
    // sub-second fractions on both sides
    val special = Seq(
      (9001L, new Timestamp(base + 240000L)),           // on a bucket boundary
      (9002L, new Timestamp(base + 240000L - 120000L)), // exactly band before
      (9003L, new Timestamp(base + 239999L)),           // 1ms inside
      (9004L, new Timestamp(base + 360500L)))           // fractional second
    val ls = ((1 to 200).map(i =>
      (i.toLong, new Timestamp(base + rnd.nextInt(600) * 1000L + rnd.nextInt(1000)))) ++
      special.take(1) :+ (9004L, special(3)._2)).toDF("lid", "lt")
    val rs = ((1 to 200).map(j =>
      (1000L + j, new Timestamp(base + rnd.nextInt(600) * 1000L + rnd.nextInt(1000)))) ++
      special).toDF("rid", "rt")

    val got = Temporal.bandJoinBackward(ls, rs, "lt", "rt", band)
      .select("lid", "rid")
    val brute = ls.join(rs,
        col("rt") >= col("lt") - expr(s"INTERVAL $band SECOND") && col("rt") <= col("lt"))
      .select("lid", "rid")
    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
    // the exact-edge pair must be present: rt == lt - band qualifies
    assert(got.filter(col("lid") === 9001L && col("rid") === 9002L).count() == 1)
  }

  test("sessionize: exact gap boundary, ties, singleton keys") {
    import spark.implicits._
    val base = 1700000000000L
    val gap = 43200L // 12h
    def mts(ms: Long) = new Timestamp(base + ms)
    val rows = Seq(
      // user 1: two close events, one at EXACTLY the gap (same session:
      // boundary is strict >), one 1ms past the gap (new session)
      (1L, 1L, mts(0)),
      (2L, 1L, mts(600000L)),                       // +10 min
      (3L, 1L, mts(600000L + gap * 1000L)),          // exactly gap after e2
      (4L, 1L, mts(600000L + 2 * gap * 1000L + 1L)), // gap + 1ms after e3
      // user 2: singleton
      (5L, 2L, mts(0)),
      // user 3: tie on ts — event_id breaks it; same session either way
      (6L, 3L, mts(1000L)),
      (7L, 3L, mts(1000L))
    ).toDF("event_id", "user_id", "ts")
    val got = Temporal.sessionize(rows, "user_id", "ts", gap, "event_id")
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("sessionize plans ONE exchange: lag and running sum share the sort") {
    import spark.implicits._
    val df = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    // executedPlan, not sparkPlan: exchanges are inserted by
    // EnsureRequirements, which only runs for the executed plan
    val plan = Temporal.sessionize(df, "user_id", "ts", 60L, "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected a single shuffle, got $exchanges:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort ")) == 1,
      s"expected the two windows to share one sort:\n$plan")
  }

  test("bandJoin plan is a hash join on buckets, not BroadcastNestedLoopJoin") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("lid", "lt")
    val rs = Seq((2L, ts("2024-01-01 09:59:00"))).toDF("rid", "rt")
    val plan = Temporal.bandJoinBackward(df, rs, "lt", "rt", 120L)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("NestedLoop"), s"theta join fell back to nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on buckets:\n$plan")
  }
}
