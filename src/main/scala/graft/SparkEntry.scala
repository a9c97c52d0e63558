package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full kg-build (extract → tag → triples → link → CC →
    * canonical rewrite) over pages synthesized from sf0.001 documents.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.runOnTestdata(spark, "/root/testdata/sf0.001").triples
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
