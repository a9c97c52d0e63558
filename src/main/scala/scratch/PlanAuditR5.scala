package scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanAuditR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    // 1. z-ordered table: both filters must reach the parquet scan
    val zdir = java.nio.file.Files.createTempDirectory("audit-z").toString
    graft.sources.ZOrder.write(
      spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_partkey", "l_suppkey", "l_quantity"),
      zdir, Seq("l_partkey", "l_suppkey"), nFiles = 16)
    val zq = spark.read.parquet(zdir)
      .filter(col("l_partkey") <= 200 && col("l_suppkey") <= 20)
      .groupBy("l_suppkey").count()
    zq.collect()
    val zplan = zq.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case pp => pp.toString
    }
    println("ZORDER-PLAN-START")
    println(zplan.take(3000))
    println("ZORDER-PLAN-END")
    // 2. merge()'s touched-partition read: the part_id filter must prune
    //    partitions of the partitioned run dir (PartitionFilters)
    val tdir = java.nio.file.Files.createTempDirectory("audit-m").toString
    val base = (0 until 100).map(i => (s"s$i", "p", s"v$i"))
      .toDF("subj", "pred", "obj")
    graft.sources.TripleSink.write(base, tdir, "r1", nParts = 8)
    val read = graft.sources.TripleSink.read(spark, tdir)
      .filter(col("part_id").isin(1, 3))
    read.collect()
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    println(s"SINK partitionFilters=${scan.partitionFilters.nonEmpty} " +
      s"selected=${scan.selectedPartitions.partitionCount} of 8")
    spark.stop()
  }
}
