package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

/** The custom top-k-per-group physical operator vs the window
  * row_number plan that defines its semantics: exact set equality on
  * multi-partition random data, plan-shape assertions (partial exec
  * below the exchange, no Window/full Sort), and the edges — k larger
  * than the group, k = 1, empty input, global top-k (no groups),
  * descending order with nulls. */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randomDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 50000).map { i =>
      (i.toLong, s"g${rnd.nextInt(40)}", rnd.nextDouble() * 1000)
    }.toDF("id", "grp", "score").repartition(7)
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= k).drop("rn")

  test("exact equality with window row_number on multi-partition data") {
    val df = randomDf
    val got = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 5)
    val want = windowTopK(df, 5)
    assert(got.count() == 200)                       // 40 groups x 5
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("plan: partial exec below the exchange, no Window, no full sort") {
    val df = randomDf
    val got = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 5)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    // two phases (nodeName strips the Exec suffix; the trailing flag is
    // `partial`), with the group-key hash exchange BETWEEN them — the
    // partial runs before the shuffle, which is the operator's point
    val partialAt = plan.indexOf(", true")
    val finalAt = plan.indexOf(", false")
    val exchangeAt = plan.indexOf("Exchange hashpartitioning(grp")
    assert(partialAt > 0 && finalAt > 0 && exchangeAt > 0, plan)
    assert(finalAt < exchangeAt && exchangeAt < partialAt,
      s"partial is not below the group exchange:\n$plan")
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    assert(!plan.contains("Sort "), s"full sort crept back in:\n$plan")
  }

  test("k >= group size returns the whole group; k = 1 returns the max") {
    import spark.implicits._
    val df = Seq((1L, "a", 3.0), (2L, "a", 1.0), (3L, "b", 2.0)).toDF("id", "grp", "score")
    val all = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 10)
    assert(all.count() == 3)
    val one = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 1)
      .select("id").as[Long].collect().toSet
    assert(one == Set(1L, 3L))
  }

  test("empty input and global (group-less) top-k") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "grp", "score")
    assert(TopK.perGroup(empty, Seq("grp"), Seq(col("id")), 3).count() == 0)
    val df = randomDf
    val global = TopK.perGroup(df, Nil, Seq(col("score").desc, col("id")), 7)
    val want = df.orderBy(col("score").desc, col("id")).limit(7)
    assert(global.exceptAll(want).isEmpty && want.exceptAll(global).isEmpty)
  }

  test("null order values placed exactly as the window operator places them") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Some(5.0)), (2L, "a", None), (3L, "a", Some(1.0)),
      (4L, "b", None), (5L, "b", None), (6L, "b", Some(2.0))
    ).toDF("id", "grp", "score").repartition(3)
    for (k <- 1 to 3) {
      val got = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), k)
      val want = windowTopK(df, k)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"null placement diverged at k=$k")
    }
  }
}
