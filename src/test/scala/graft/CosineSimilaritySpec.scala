package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The native codegen cosine expression vs the independently-derived
  * HOF composition: bit-identity on well-formed inputs (float AND
  * double arrays — including the float-precision-products detail),
  * documented edge semantics, SQL registration, and codegen vs
  * interpreted agreement. */
class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bit-identical to the HOF cosine on random float arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map { _ =>
      val d = 1 + rnd.nextInt(64)
      (Array.fill(d)(rnd.nextFloat() * 2 - 1), Array.fill(d)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
      .select(Similarity.cosineCol(col("a"), col("b")).as("native"),
        Similarity.cosineColHof(col("a"), col("b")).as("hof"))
    // bit-identical, not approximately-equal: both compute float
    // products accumulated in double, in index order
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("bit-identical to the HOF cosine on double arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    val rows = (1 to 200).map { _ =>
      val d = 1 + rnd.nextInt(32)
      (Array.fill(d)(rnd.nextDouble() * 2 - 1), Array.fill(d)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
      .select(Similarity.cosineCol(col("a"), col("b")).as("native"),
        Similarity.cosineColHof(col("a"), col("b")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("edge semantics: zero norm -> 0.0, null array / mismatch / null elem -> null") {
    import spark.implicits._
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosineCol(col("a"), col("b")).as("c"))
    assert(z.head().getDouble(0) == 0.0)
    val nullArr = Seq((Option.empty[Array[Float]], Some(Array(1.0f))))
      .toDF("a", "b").select(Similarity.cosineCol(col("a"), col("b")).as("c"))
    assert(nullArr.head().isNullAt(0))
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosineCol(col("a"), col("b")).as("c"))
    assert(mismatch.head().isNullAt(0))
    // null-element case needs SQL (no Scala encoder puts a null inside
    // Array[Float]); register under a test-local name
    val (_, info, builder) = graft.functions.CosineSimilarity.descriptor
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine_test"), info, builder)
    val nullElem = spark.sql(
      "SELECT graft_cosine_test(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) c")
    assert(nullElem.head().isNullAt(0))
  }

  test("SQL registration via the extensions descriptor") {
    val (ident, info, builder) = graft.functions.CosineSimilarity.descriptor
    // same triple GraftExtensions.injectFunction hands to the session
    // builder, registered directly on the shared test session
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val got = spark.sql(
      "SELECT round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)), 6) c")
      .head().getDouble(0)
    assert(got == math.rint(1.0 / math.sqrt(2.0) * 1e6) / 1e6)
    // type misuse is an analysis-time error, not a runtime crash
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array('x'), array('y'))").collect()
    }
    assert(err.getMessage.contains("graft_cosine"))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Array(0.5f, -1.25f, 3.0f)
    val b = Array(2.0f, 0.25f, -0.75f)
    // interpreted: eval() directly on the expression
    val e = graft.functions.CosineSimilarity(
      Literal.create(ArrayData.toArrayData(a), ArrayType(FloatType)),
      Literal.create(ArrayData.toArrayData(b), ArrayType(FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    // codegen: through a DataFrame select (whole-stage codegen on)
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(Similarity.cosineCol(col("a"), col("b"))).head().getDouble(0)
    assert(interpreted == viaDf)
  }
}
