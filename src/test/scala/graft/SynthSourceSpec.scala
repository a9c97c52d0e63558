package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hashing
import graft.sources.v2.SynthEvents

/** The custom DSv2 source: row-for-row value identity with a
  * driver-side mirror of the generator math, source-planned partition
  * count, column pruning reaching the reader (the v2 scan's readSchema
  * shrinks to the projection), options handling, and schema. */
class SynthSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def read(rows: Long = 1000L, parts: Int = 4, seed: Long = 42L) =
    spark.read.format("graft.sources.v2.SynthEventsSource")
      .option("rows", rows).option("parts", parts).option("seed", seed)
      .load()

  test("row-for-row identity with the generator math") {
    import spark.implicits._
    val got = read(rows = 1000)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"), col("value"))
      .as[(Long, Long, String, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 1000)
    got.foreach { case (id, uid, et, tsu, v) =>
      val h = Hashing.splitmix64(id + 42L)
      assert(uid == SynthEvents.userId(h) && et == SynthEvents.etype(h) &&
        tsu == SynthEvents.tsMicros(h) && v == SynthEvents.value(h),
        s"row $id mismatch")
    }
    // all four event types actually occur
    assert(got.map(_._3).distinct.sorted.toSeq ==
      Seq("click", "purchase", "refund", "view"))
  }

  test("the source plans the partitioning — no shuffle anywhere") {
    val df = read(rows = 1000, parts = 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    // rows split the range without loss or overlap
    assert(df.count() == 1000)
    assert(df.select("event_id").distinct().count() == 1000)
  }

  test("column pruning reaches the reader (v2 readSchema shrinks)") {
    val pruned = read().select("event_id", "user_id")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("event_id", "user_id"),
      s"projection did not reach the source: ${scan.scan.description()}")
  }

  test("event_id range filters prune whole planned partitions") {
    import spark.implicits._
    // rows=1000, parts=10 → splits of 100 ids each
    val base = read(rows = 1000, parts = 10)
    val sel = base.filter(col("event_id") >= 850)
    assert(sel.rdd.getNumPartitions == 2,
      "range [850,1000) should clip to the last 2 of 10 splits")
    assert(sel.count() == 150)
    // the retained post-scan filter keeps correctness independent of
    // the pruning math: values identical to filtering the full read
    val want = base.collect().filter(_.getLong(0) >= 850).map(_.getLong(0)).sorted
    assert(sel.select("event_id").as[Long].collect().sorted.toSeq == want.toSeq)
    // a non-range-expressible predicate prunes nothing but stays correct
    val odd = base.filter(col("user_id") % 2 === 1)
    assert(odd.rdd.getNumPartitions == 10)
    assert(odd.count() ==
      base.collect().count(r => r.getLong(1) % 2 == 1))
    // an impossible range plans ZERO partitions
    assert(base.filter(col("event_id") < 0).rdd.getNumPartitions == 0)
    // saturation: a Long.MaxValue bound must not wrap (v + 1 overflow
    // would clamp the window to empty and silently drop every row)
    assert(base.filter(col("event_id") <= Long.MaxValue).count() == 1000)
    assert(base.filter(col("event_id") === Long.MaxValue).count() == 0)
  }

  test("seed changes the data; rows=0 is an empty frame with the schema") {
    val a = read(rows = 100, seed = 1L).agg(sum("user_id")).head().getLong(0)
    val b = read(rows = 100, seed = 2L).agg(sum("user_id")).head().getLong(0)
    assert(a != b)
    val empty = read(rows = 0L)
    assert(empty.count() == 0 && empty.schema == SynthEvents.schema)
  }
}
