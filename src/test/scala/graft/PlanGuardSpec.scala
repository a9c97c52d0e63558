package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties BENCH.md's plan
  * audits record, enforced as assertions so a future refactor cannot
  * silently trade them away. Each guard states WHY the property is
  * load-bearing at 100 TB. Counts use the post-AQE executed plan of an
  * actually-executed query (AQE finalizes plans lazily). */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // AdaptiveSparkPlan prints Final AND Initial sections — count only
    // the final (actually executed) one
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  private def count(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)

  test("filter pushdown reaches the parquet scan (q_filter)") {
    val plan = executed(SparkEntry.queries("q_filter")(spark, sf))
    // a scan that filters AFTER reading pays full I/O at 100 TB
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate") && plan.contains("l_returnflag"),
      s"predicates missing from PushedFilters:\n$plan")
  }

  test("column pruning reaches the scan (q_scan_project reads 4 of 16 columns)") {
    val plan = executed(SparkEntry.queries("q_scan_project")(spark, sf))
    val rs = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(rs.nonEmpty, plan)
    // exactly the 4 referenced lineitem columns — a full-width read is
    // the single largest avoidable cost of a projection at scale
    Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      .foreach(c => assert(rs.exists(_.contains(c)), s"$c not in ReadSchema: $rs"))
    Seq("l_comment", "l_shipdate", "l_partkey")
      .foreach(c => assert(!rs.exists(_.contains(c)), s"$c wrongly read: $rs"))
  }

  test("q_agg_q1 aggregates partially before its single exchange") {
    val plan = executed(SparkEntry.queries("q_agg_q1")(spark, sf))
    // map-side combine is what keeps a 10^12-row groupBy's shuffle
    // proportional to |groups|, not |rows|
    assert(count(plan, "HashAggregate") >= 2, s"no partial+final pair:\n$plan")
    // one exchange for the groupBy + one for the deterministic orderBy
    assert(count(plan, "Exchange") <= 2, s"extra exchanges crept in:\n$plan")
  }

  test("flagship triples: rewrite joins broadcast, no nested-loop, bounded exchanges") {
    val out = Pipeline.runOnTestdata(spark, sf)
    val plan = executed(out.triples)
    // the canon map is mention-vocabulary-sized — broadcastable by
    // construction; a shuffle join here would re-shuffle the full
    // triple stream twice
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // A2→A10 is narrow; only the canon build + rewrite add exchanges.
    // Generous bound — the guard is against accidental quadratic
    // re-planning, not exact plan pinning.
    assert(count(plan, "Exchange") <= 8,
      s"flagship exchange count exploded (${count(plan, "Exchange")}):\n$plan")
  }

  test("6-way join: every dimension broadcasts; the fact table never shuffles for a join") {
    // cap auto-broadcast BELOW lineitem's size (117 KB at sf0.001) so
    // the guard has teeth: if a planner change ever put the fact table
    // on a build side, it could not broadcast and the join would fall
    // back to a SortMergeJoin — caught below. The dimensions (<= 37 KB)
    // stay broadcastable.
    val plan = graft.sources.Bucketed.withConfs(spark, Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "65536",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "65536")) {
      executed(SparkEntry.queries("q_join_multiway")(spark, sf))
    }
    // all five joins against dimension-sized sides must be broadcast:
    // at 100 TB the lineitem stream passes through ONCE, never
    // re-partitioned per join
    assert(count(plan, "BroadcastHashJoin") == 5, s"expected 5 broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"a dimension join fell back to a shuffle join:\n$plan")
    // remaining exchanges: the groupBy and the final orderBy only
    assert(count(plan, "Exchange hashpartitioning") <= 1 &&
      count(plan, "Exchange rangepartitioning") <= 1, plan)
  }

  test("q_window_topk sorts once: lag/topk window shares its exchange") {
    val plan = executed(SparkEntry.queries("q_window_topk")(spark, sf))
    // window + final orderBy: 2 exchanges max; a regression that adds
    // a repartition per window op multiplies shuffle volume at scale
    assert(count(plan, "Exchange") <= 2, plan)
  }

  test("dynamic partition pruning reaches the partitioned fact scan (q_join_dpp shape)") {
    import org.apache.spark.sql.functions._
    // the q_join_dpp query body minus the final localCheckpoint (which
    // replaces the executed plan with a checkpoint scan)
    val path = java.nio.file.Files.createTempDirectory("graft-dpp-spec").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    val fact = spark.read.parquet(path)
    val dim = orders.select(col("o_orderpriority").as("pr"))
      .distinct().filter(col("pr").isin("1-URGENT", "2-HIGH"))
    val q = fact.join(dim, col("o_orderpriority") === col("pr"))
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_orders"))
    val plan = executed(q)
    // at 100 TB the pruned partitions are never READ — the runtime
    // subquery must appear inside the scan's PartitionFilters, not as
    // a post-scan Filter
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in the fact scan:\n$plan")
    // value sanity: only the two surviving priorities aggregated
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1-URGENT", "2-HIGH"))
  }

  test("runtime bloom filter probes the fact scan before the shuffle (q_join_bloom shape)") {
    import org.apache.spark.sql.functions._
    val plan = graft.sources.Bucketed.withConfs(spark, Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")) {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val urgent = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val q = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_items"))
      executed(q)
    }
    // the bloom probe must land on the FACT side scan: rows are
    // dropped before the exchange, which is the whole point at scale
    assert(plan.contains("might_contain"),
      s"no bloom-filter probe in the executed plan:\n$plan")
    // and the join stayed a shuffle join (the regime bloom exists for)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"join unexpectedly broadcast — bloom would be moot:\n$plan")
  }

  test("CDC tail span reads ONLY the appended run's files (changes() scoping)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.sources.TripleSink
    val path = java.nio.file.Files.createTempDirectory("graft-cdc-scope").toString
    TripleSink.write((0 until 2000).map(i => (s"s$i", "p", s"v$i"))
      .toDF("subj", "pred", "obj"), path, "r1", nParts = 8)
    TripleSink.write(Seq(("x", "p", "new")).toDF("subj", "pred", "obj"),
      path, "r2", nParts = 8, append = true)

    // a one-append span over an accumulated table: the manifest diff
    // must resolve the read to the appended run alone — at 10^12 rows
    // a changelog read that touches the table is useless as the
    // incremental feed it exists to be (CdcBench measures the constant
    // cost; this guard pins the mechanism)
    val chg = TripleSink.changes(spark, path, "r1", "r2")
    chg.collect()
    val scannedFiles = chg.inputFiles.toSeq
    assert(scannedFiles.nonEmpty, "no input files reported for the changelog read")
    assert(scannedFiles.forall(_.contains("run=r2")),
      s"tail-span changelog read touched non-appended files:\n${scannedFiles.mkString("\n")}")
  }
}
