package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Micro-bench: native codegen cosine expression vs the HOF
  * (aggregate∘zip_with) composition, on the ANN-brute scoring shape
  * (corpus × broadcast queries). */
object CosBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cosbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 500000
    val dim = 64
    val nq = 8
    // deterministic corpus: splitmix-ish per (id, i) floats in [-1, 1)
    val corpus = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(xxhash64(col("id"), i), lit(2000000L)).cast("float") / 1000000.0f - 1.0f)
          .as("embedding"))
      .repartition(32).cache()
    corpus.count()

    val queries = corpus.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    def pass(tag: String, cos: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      val s = corpus.crossJoin(broadcast(queries))
        .select(cos(col("qv"), col("embedding")).as("c"))
        .agg(sum("c")).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"COSBENCH $tag%-8s ${dt}%7.3f s  (sum=$s%.6f, ${n.toLong * nq} pairs)")
      dt
    }

    // warm both paths (JIT + codegen cache), then 3 timed passes each, alternating
    pass("warm-hof", Similarity.cosineColHof); pass("warm-nat", Similarity.cosineCol)
    val hof = (1 to 3).map(_ => pass("hof", Similarity.cosineColHof))
    val nat = (1 to 3).map(_ => pass("native", Similarity.cosineCol))
    val hof2 = (1 to 2).map(_ => pass("hof", Similarity.cosineColHof))
    val nat2 = (1 to 2).map(_ => pass("native", Similarity.cosineCol))
    val hmin = (hof ++ hof2).min; val nmin = (nat ++ nat2).min
    println(f"COSBENCH RESULT min(hof)=$hmin%.3f s  min(native)=$nmin%.3f s  speedup=${hmin / nmin}%.2f x")
    spark.stop()
  }
}
