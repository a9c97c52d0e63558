package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.freqItems
import graft.operators.TextAnalysis

/** The native Misra-Gries aggregate: the n/(k+1) superset guarantee
  * under several partitionings (update AND merge paths), the
  * decrement-all overflow path (vocab >> k), small-vocab exactness,
  * the end-to-end frequentTerms operator vs the full groupBy answer,
  * and SQL registration. */
class FreqItemsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Skewed corpus: 5 planted heavy hitters (8% / 6% / 5% / 4% / 3%)
    * over a 2000-word uniform tail — vocabulary far above k so the
    * sketch constantly overflows. */
  private def skewed = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val heavy = Seq("alpha" -> 2080, "beta" -> 1560, "gamma" -> 1300,
      "delta" -> 1040, "epsilon" -> 780)
    val tail = Seq.fill(26000 - heavy.map(_._2).sum)(s"w${rnd.nextInt(2000)}")
    val words = rnd.shuffle(heavy.flatMap { case (w, c) => Seq.fill(c)(w) } ++ tail)
    words.toDF("word")
  }

  test("superset guarantee: every >n/(k+1) item survives any partitioning") {
    val df = skewed
    val total = df.count()
    val exact = df.groupBy("word").count()
      .filter(col("count") > total / 33).collect().map(_.getString(0)).toSet
    assert(exact.nonEmpty)
    for (parts <- Seq(1, 3, 8, 31)) {
      val cands = df.repartition(parts)
        .agg(freqItems(col("word"), 32)).head().getSeq[String](0).toSet
      assert(cands.size <= 32)
      val missed = exact -- cands
      assert(missed.isEmpty, s"parts=$parts missed guaranteed items: $missed")
    }
  }

  test("small vocab <= k: output is exactly the distinct set, sorted") {
    import spark.implicits._
    val df = Seq("b", "a", "c", "a", "b", "a").toDF("word").repartition(3)
    val got = df.agg(freqItems(col("word"), 8)).head().getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }

  test("nulls ignored; empty input yields empty array") {
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("x"), None).toDF("word")
    assert(df.agg(freqItems(col("word"), 4)).head().getSeq[String](0) == Seq("x"))
    val empty = Seq.empty[String].toDF("word")
    assert(empty.agg(freqItems(col("word"), 4)).head().getSeq[String](0).isEmpty)
  }

  test("frequentTerms end-to-end equals the full groupBy HAVING answer") {
    import spark.implicits._
    val docs = skewed.groupBy(pmod(xxhash64(col("word")), lit(97)).as("doc_id"))
      .agg(concat_ws(" ", collect_list(col("word"))).as("text"))
    val got = TextAnalysis.frequentTerms(docs, k = 40, pctTimes100 = 300)
      .as[(String, Long)].collect().toSeq
    val words = docs.select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val n = words.count()
    val want = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10000L >= lit(300L * n))
      .orderBy("word").as[(String, Long)].collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("SQL registration: graft_freq_items in a grouped query") {
    import spark.implicits._
    val (_, info, builder) = graft.functions.FreqItemsSketch.descriptor
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_freq_items"), info, builder)
    Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "word").createOrReplaceTempView("fi_t")
    val got = spark.sql(
      "SELECT g, graft_freq_items(word, 4) AS c FROM fi_t GROUP BY g ORDER BY g")
      .as[(String, Seq[String])].collect().toSeq
    assert(got == Seq(("g1", Seq("x", "y")), ("g2", Seq("z"))))
  }
}
