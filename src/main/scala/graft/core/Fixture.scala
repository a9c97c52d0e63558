package graft.core

/** Deterministic Chinese NER fixture corpus (FIXTURES.md §2). Pure
  * function of doc_id — both the single-threaded oracle and Spark
  * executors can synthesize any document independently (parallel-safe;
  * no shared Random). Seed base 42.
  *
  * The generator is the ground truth: it knows every span and every
  * canonical triple it planted. The HMM is trained on this corpus's gold
  * tags (closed-world — SURVEY.md §7 hard-part 3).
  */
object Fixture {

  val PER: Vector[String] = Vector("张伟", "王芳", "李娜", "刘洋", "陈静", "杨军", "赵敏", "周杰")
  val ORG: Vector[String] = Vector("北京大学", "清华大学", "阿里巴巴", "腾讯公司", "中国科学院", "华为技术", "复旦大学", "百度公司")
  val LOC: Vector[String] = Vector("北京", "上海", "深圳", "杭州", "广州", "南京", "成都", "武汉")

  /** variant surface → canonical form (FIXTURES.md §2 alias knob). */
  val aliasOf: Map[String, String] =
    Map("阿里巴巴集团" -> "阿里巴巴", "北大" -> "北京大学")
  private val variantOf: Map[String, String] = aliasOf.map(_.swap)

  // Skew knob: 北京 and 阿里巴巴 drawn with 10× weight (hot keys, A17).
  private val ORGW: Vector[String] = ORG ++ Vector.fill(9)("阿里巴巴")
  private val LOCW: Vector[String] = LOC ++ Vector.fill(9)("北京")

  final case class GoldSentence(text: String, spans: Vector[Span],
                                triples: Vector[(String, String, String)])
  final case class ZhDoc(docId: Long, sentences: Vector[GoldSentence]) {
    def text: String = sentences.map(_.text).mkString
    def goldTriples: Vector[(String, String, String)] = sentences.flatMap(_.triples)
    /** (chars, gold BIO tags) per sentence — HMM training rows. */
    def tagged: Vector[(Array[Char], Array[String])] =
      sentences.map(s => (s.text.toCharArray, Bio.encode(s.text.length, s.spans)))
  }

  private def mix(docId: Long): Long = 42L + docId * 0x9E3779B97F4A7C15L

  def zhDoc(docId: Long): ZhDoc = {
    val rng = new scala.util.Random(mix(docId))
    val nSent = 1 + rng.nextInt(4)
    val sents = Vector.tabulate(nSent) { _ =>
      val t = rng.nextInt(5)
      val per = PER(rng.nextInt(PER.length))
      val org = ORGW(rng.nextInt(ORGW.length))
      val loc = LOCW(rng.nextInt(LOCW.length))
      // alias knob: p=0.2 variant surface; gold triples keep canonical
      def surface(canon: String): String = variantOf.get(canon) match {
        case Some(v) if rng.nextDouble() < 0.2 => v
        case _ => canon
      }
      val sOrg = surface(org)
      t match {
        case 0 => build(Vector((per, "PER"), (sOrg, "ORG")), Vector("", "任职于", "。"),
                        Vector((per, "works_at", org)))
        case 1 => build(Vector((per, "PER"), (loc, "LOC")), Vector("", "出生于", "。"),
                        Vector((per, "born_in", loc)))
        case 2 => build(Vector((sOrg, "ORG"), (loc, "LOC")), Vector("", "位于", "。"),
                        Vector((org, "located_in", loc)))
        case 3 => build(Vector((per, "PER"), (sOrg, "ORG"), (loc, "LOC")),
                        Vector("", "毕业于", "，现居", "。"),
                        Vector((per, "graduated_from", org), (per, "lives_in", loc)))
        case _ => build(Vector((loc, "LOC")), Vector("", "是一座城市。"), Vector.empty)
      }
    }
    ZhDoc(docId, sents)
  }

  /** Interleave glue(0), ent(0), glue(1), ent(1), ..., glue(last);
    * records span offsets as it goes. */
  private def build(ents: Vector[(String, String)], glue: Vector[String],
                    triples: Vector[(String, String, String)]): GoldSentence = {
    val sb = new StringBuilder
    val spans = Vector.newBuilder[Span]
    var i = 0
    while (i < ents.length) {
      sb.append(glue(i))
      val (m, ty) = ents(i)
      val b = sb.length
      sb.append(m)
      spans += Span(m, ty, b, sb.length)
      i += 1
    }
    sb.append(glue(ents.length))
    GoldSentence(sb.toString, spans.result(), triples)
  }

  /** Fixed HMM training corpus: gold-tagged sentences of docs 0..499,
    * independent of which scale factor a run reads. Deterministic.
    *
    * Sentences are trained in PAGE SHAPE — i.e. as they come out of the
    * extractor, where the html <title> text ("t{id} ") is glued onto the
    * first sentence — with the title prefix gold-tagged O. Training on
    * raw template sentences alone leaves π(O) ≈ 0 (every template starts
    * with an entity), which made Viterbi tag the ASCII title as a PER
    * span and emit junk triples like (t42, born_in, 北京). */
  val TrainDocs: Int = 500

  /** Gold-tagged training rows for one doc, page-shaped (see above). */
  def pageTrainingRows(docId: Long): Vector[(Array[Char], Array[String])] = {
    val d = zhDoc(docId)
    d.sentences.zipWithIndex.map { case (gs, i) =>
      val base = (gs.text.toCharArray, Bio.encode(gs.text.length, gs.spans))
      if (i == 0) {
        val prefix = s"t$docId "
        (prefix.toCharArray ++ base._1, Array.fill(prefix.length)("O") ++ base._2)
      } else base
    }
  }

  lazy val model: HmmModel =
    Hmm.train((0 until TrainDocs).iterator.flatMap(id => pageTrainingRows(id.toLong)).toSeq)

  /** Pages-table synthesis mapping (FIXTURES.md §1): one page per
    * documents.parquet row. For zh rows the body is the planted Chinese
    * corpus (documents.text is English filler). `text` is null for every
    * third doc — those rows force the pipeline down the extract-from-html
    * path. */
  def pageUrl(docId: Long, source: String): String = s"https://$source.example/$docId"

  def pageHtml(docId: Long, body: String): Array[Byte] =
    (s"<html><head><title>t$docId</title></head><body><p>" + body +
      "</p></body></html>").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def pageBody(docId: Long, docText: String, lang: String): String =
    if (lang == "zh") zhDoc(docId).text else docText

  /** Epoch seconds of 2026-01-01T00:00:00Z + doc_id (FIXTURES.md §1). */
  def pageTsSeconds(docId: Long): Long = 1767225600L + docId
}
