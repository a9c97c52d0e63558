package scratch
import org.apache.spark.sql.SparkSession
import graft._
import graft.operators._
import graft.sources.Pages
import org.apache.spark.storage.StorageLevel

object Prof {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val replicate = args.lift(1).map(_.toInt).getOrElse(1024)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warm-up full pass
    Pipeline.runOnTestdata(spark, "/root/testdata/sf0.1", replicate / 8).triples.count()
    for (round <- 1 to 2) {
      println(s"[prof] === round $round cores=$cores rep=$replicate ===")
      val pages = Pages.synthesize(spark, "/root/testdata/sf0.1", replicate)
      t("pages_only")(pages.map(_.url.length.toLong).reduce(_ + _))
      val bc = spark.sparkContext.broadcast(graft.core.Fixture.model)
      val extracted = Stages.extract(pages, 64)
      t("extract")(extracted.select("text_sha256").filter("text_sha256 is not null").count())
      val tagged = Stages.tag(extracted, bc)
      val raw = Stages.rawTriples(tagged).persist(StorageLevel.MEMORY_AND_DISK)
      t("narrow_to_raw")(raw.count())
      t("raw_recount")(raw.count())
      val nodes = Linking.nodesFromTriples(raw, 16)
      val edges = Linking.edges(Linking.signatures(nodes))
      val canon = Canonicalize.canonMap(nodes, edges)
      t("link_cc_canon")(canon.count())
      val canonLocal = canon.persist(StorageLevel.MEMORY_AND_DISK)
      t("canon_persist_count")(canonLocal.count())
      t("rewrite_distinct")(Canonicalize.rewrite(raw, canonLocal).count())
      canonLocal.unpersist()
      raw.unpersist()
    }
    spark.stop()
  }
}
