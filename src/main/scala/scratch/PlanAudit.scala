package scratch
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("plans").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q_graph_triangles", "q_graph_pagerank")) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$q: $n rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
      val ep = df.queryExecution.executedPlan.toString
      println(s"  ReusedExchange nodes: ${ep.linesIterator.count(_.contains("ReusedExchange"))}")
      println(s"  Exchange nodes: ${ep.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))}")
      println(s"  parquet scans: ${ep.linesIterator.count(_.contains("Scan parquet"))}")
    }
    spark.stop()
  }
}
