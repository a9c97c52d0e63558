package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TripleSink

/** DSv2 read integration for the snapshot table
  * (graft.sources.v2.TriplesSource): value parity with the library
  * read paths, snapshot-pinned planning, plan-time partition pruning
  * from pushed subj predicates, column pruning, schema evolution,
  * MOR delete application, and the SQL view surface. */
class TriplesV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Fmt = "graft.sources.v2.TriplesSource"

  private def v2(path: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format(Fmt).option("path", path))(
      (r, kv) => r.option(kv._1, kv._2)).load()

  private def rows(df: DataFrame): Set[(String, String, String)] =
    df.select("subj", "pred", "obj").as[(String, String, String)].collect().toSet

  test("v2 read matches the library read across append/merge/evolution/MOR; time travel via asOf and tag") {
    val path = Files.createTempDirectory("graft-v2-triples").toString
    def frame(rs: (String, String, String)*) = rs.toDF("subj", "pred", "obj")

    TripleSink.write(frame(("a", "p", "1"), ("b", "p", "2"), ("c", "q", "3")),
      path, "r1", nParts = 4)
    // schema evolution: r2 appends with an extra bigint column
    TripleSink.write(
      Seq(("d", "p", "4", 7L)).toDF("subj", "pred", "obj", "score"),
      path, "r2", nParts = 4, append = true)
    TripleSink.merge(spark, path, Seq(("a", "p", "1x", 9L))
      .toDF("subj", "pred", "obj", "score"), "m1")
    TripleSink.applyDeltaMOR(spark, path,
      Seq(("e", "p", "5", 1L)).toDF("subj", "pred", "obj", "score"),
      Seq(("b", "p", "2", null.asInstanceOf[java.lang.Long]))
        .toDF("subj", "pred", "obj", "score"), "mor1")
    TripleSink.tag(path, "v1", "r1")

    // latest snapshot: full value parity including the evolved column
    // and run_id/part_id, against the library read
    val lib = TripleSink.read(spark, path)
      .select("subj", "pred", "obj", "score", "run_id", "part_id")
      .as[(String, String, String, Option[Long], String, Int)].collect().toSet
    val got = v2(path)
      .select("subj", "pred", "obj", "score", "run_id", "part_id")
      .as[(String, String, String, Option[Long], String, Int)].collect().toSet
    assert(got == lib && got.map(_._1) == Set("a", "c", "d", "e"),
      s"v2 read diverged: $got vs $lib")

    // time travel: asOf == readAsOf (pre-evolution snapshot has no
    // score column at all), tag == readTag
    assert(rows(v2(path, "asOf" -> "r1")) ==
      Set(("a", "p", "1"), ("b", "p", "2"), ("c", "q", "3")))
    assert(!v2(path, "asOf" -> "r1").columns.contains("score"),
      "pre-evolution snapshot leaked the evolved column")
    assert(rows(v2(path, "tag" -> "v1")) == rows(v2(path, "asOf" -> "r1")))
    intercept[IllegalArgumentException] { v2(path, "asOf" -> "nope").count() }

    // snapshot-pinned planning: a frame loaded BEFORE a new commit
    // still reads its own snapshot afterwards
    val pinned = v2(path)
    TripleSink.write(frame(("z", "z", "z")), path, "r9", nParts = 2)
    assert(rows(pinned).map(_._1) == Set("a", "c", "d", "e"),
      "racing commit shifted a pinned v2 scan")
    assert(rows(v2(path)) == Set(("z", "z", "z")))

    // branch option: the v2 relation reads a branch head == readBranch,
    // while the default read stays on main
    TripleSink.createBranch(path, "exp", "r9")
    TripleSink.writeToBranch(frame(("y", "y", "y")), path, "exp", "b1",
      nParts = 2, append = true)
    assert(rows(v2(path, "branch" -> "exp")) ==
      Set(("z", "z", "z"), ("y", "y", "y")))
    assert(rows(v2(path)) == Set(("z", "z", "z")),
      "branch-staged rows leaked into the main v2 read")
    intercept[IllegalArgumentException] { v2(path, "branch" -> "nope").count() }
  }

  test("v2 pushdown: subj predicates prune partitions at plan time; projection prunes columns") {
    val path = Files.createTempDirectory("graft-v2-prune").toString
    val data = (0 until 400).map(i => (s"e$i", "p", s"v$i"))
    TripleSink.write(data.toDF("subj", "pred", "obj"), path, "r1", nParts = 8)
    TripleSink.write((400 until 500).map(i => (s"e$i", "p", s"v$i"))
      .toDF("subj", "pred", "obj"), path, "r2", nParts = 8, append = true)

    val full = v2(path)
    val fullSplits = full.rdd.getNumPartitions
    assert(fullSplits >= 16, s"expected >=16 file splits, got $fullSplits")

    // EqualTo: one subject -> one hash partition per run
    val one = full.filter(col("subj") === "e42")
    assert(one.rdd.getNumPartitions <= 2,
      s"subj= pruning failed: ${one.rdd.getNumPartitions} of $fullSplits splits")
    assert(rows(one) == Set(("e42", "p", "v42")))

    // In: the probes' partitions only — and values complete (pruning
    // must never lose a row, whatever the hash math does)
    val in = full.filter(col("subj").isin("e1", "e250", "e499"))
    assert(in.rdd.getNumPartitions < fullSplits / 2)
    assert(rows(in) ==
      Set(("e1", "p", "v1"), ("e250", "p", "v250"), ("e499", "p", "v499")))

    // contradictory conjuncts intersect to nothing: zero splits planned
    val none = full.filter(col("subj") === "e1" && col("subj") === "e2")
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0)

    // column pruning reaches the scan (the Scan prints its ReadSchema)
    val projected = full.select("subj").queryExecution.executedPlan.toString
    assert(projected.contains("ReadSchema: struct<subj:string>"),
      s"projection did not reach the v2 scan:\n$projected")
  }

  test("v2 SQL surface: CREATE TEMPORARY VIEW ... USING, then plain SQL") {
    val path = Files.createTempDirectory("graft-v2-sql").toString
    TripleSink.write(Seq(("a", "p", "1"), ("b", "p", "2"), ("b", "q", "3"))
      .toDF("subj", "pred", "obj"), path, "r1", nParts = 4)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW kg_v2_spec
                 |USING $Fmt OPTIONS (path '$path')""".stripMargin)
    try {
      assert(spark.sql(
        "SELECT subj, count(*) AS n FROM kg_v2_spec GROUP BY subj ORDER BY subj")
        .as[(String, Long)].collect().toSeq == Seq(("a", 1L), ("b", 2L)))
      assert(spark.sql("SELECT obj FROM kg_v2_spec WHERE subj = 'b' ORDER BY obj")
        .as[String].collect().toSeq == Seq("2", "3"))
    } finally spark.catalog.dropTempView("kg_v2_spec")
  }
}
