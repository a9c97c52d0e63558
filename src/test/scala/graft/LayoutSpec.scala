package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout techniques the 100 TB deployment leans on, beyond
  * bucketing (BucketingSpec): directory partitioning + partition
  * pruning — a selective read of a date-partitioned table must touch
  * only the matching directories, proven on the executed plan AND by
  * the actually-read file count. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("date-partitioned write: a month filter prunes to that month's directory") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_layout").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.write.mode("overwrite").partitionBy("o_month").parquet(dir)
    val months = orders.select("o_month").distinct().count()
    assert(months > 10, s"fixture too small to prove pruning: $months months")

    val read = spark.read.parquet(dir).filter(col("o_month") === "1995-03")
    val rows = read.count()
    assert(rows == orders.filter(col("o_month") === "1995-03").count() && rows > 0)

    // the pruning evidence: the scan's partition filters are present
    // and the planned file count is the ONE month's files, not all
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "partition filter did not reach the scan")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 1,
      s"expected 1 of $months month directories selected, got $selected")
  }
}
