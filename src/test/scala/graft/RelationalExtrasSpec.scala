package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the round-3 relational extensions that the
  * DuckDB hash oracle can't see: pivot∘unpivot round-trip, full-outer
  * null extension in BOTH directions, and content-hash sample
  * determinism across partitionings. */
class RelationalExtrasSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("unpivot inverts pivot (round-trip on a status-count matrix)") {
    import spark.implicits._
    val base = Seq(("1-URGENT", "F", 3L), ("1-URGENT", "O", 2L), ("5-LOW", "P", 7L))
      .toDF("prio", "status", "cnt")
    val wide = base.groupBy("prio").pivot("status", Seq("F", "O", "P"))
      .agg(first("cnt")).na.fill(0L)
    val back = wide.unpivot(Array(col("prio")),
        Array(col("F"), col("O"), col("P")), "status", "cnt")
      .filter(col("cnt") =!= 0L)
    assert(back.except(base).isEmpty && base.except(back).isEmpty)
  }

  test("full outer join extends nulls in both directions") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((2, 20), (3, 30)).toDF("k2", "rv")
    val j = l.join(r, col("k") === col("k2"), "full_outer")
      .select(coalesce(col("k"), col("k2")).as("key"), col("lv"), col("rv"))
      .orderBy("key").collect()
    assert(j.length == 3)
    assert(j(0).getString(1) == "a" && j(0).isNullAt(2)) // left-only
    assert(j(1).getString(1) == "b" && j(1).getInt(2) == 20) // matched
    assert(j(2).isNullAt(1) && j(2).getInt(2) == 30) // right-only
  }

  test("content-hash sample picks identical rows under any partitioning") {
    import spark.implicits._
    val docs = (1 to 400).map(i => (i.toLong, s"doc text number $i")).toDF("id", "text")
    def sample(parts: Int): Set[Long] =
      docs.repartition(parts)
        .filter(substring(md5(col("text").cast("binary")), 1, 1).isin("0", "1"))
        .select("id").as[Long].collect().toSet
    val s1 = sample(1)
    assert(s1 == sample(7) && s1 == sample(32))
    // ~1/8 of 400, loose bounds — determinism above is the real assert
    assert(s1.size > 20 && s1.size < 90)
  }

  test("percentile_disc returns an actual data value; percentile interpolates") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = df.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").as("d"),
      expr("percentile(x, 0.25D)").as("c")).head()
    assert(r.getDouble(0) == 2.0) // smallest value with cume_dist >= 0.5
    assert(r.getDouble(1) == 1.75) // linear interpolation at (n-1)*p
  }

  test("approx_percentile lands within the sketch's rank-error bound of exact") {
    // GK-sketch contract: with accuracy a, the returned value's RANK is
    // within n/a of the target rank. Verify on real data by rank, not
    // by value distance (value error is unbounded for spread-out data).
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val xs = orders.select("o_totalprice").as[Double](
      org.apache.spark.sql.Encoders.scalaDouble).collect().sorted
    val n = xs.length
    val accuracy = 10000
    val got = orders.agg(
      expr(s"approx_percentile(o_totalprice, array(0.5D, 0.9D), $accuracy)"))
      .head().getSeq[Double](0)
    for ((p, v) <- Seq(0.5, 0.9).zip(got)) {
      val rank = xs.count(_ <= v)
      val err = math.abs(rank - p * n)
      assert(err <= math.max(1.0, 2.0 * n / accuracy),
        s"p=$p value $v at rank $rank vs target ${p * n} (n=$n)")
    }
  }
}
