package graft.oracle

import graft.core._

/** The in-repo reference oracle (SURVEY.md §0, §5.1).
  *
  * `/root/reference/` is empty in this sandbox, so this compact,
  * single-threaded, zero-Spark implementation plays the role of "the
  * reference extractor / the reference NER toolkit" (BASELINE.json:6).
  * It composes the same pure functions (graft.core.*) the distributed
  * pipeline uses — extraction is therefore byte-identical by
  * construction, and the triple P/R gate measures pipeline fidelity
  * (linking/canonicalization differences), not model quality.
  *
  * Canonicalization here is the oracle's "simpler exact-key form": a
  * direct alias-table lookup, vs the pipeline's MinHash-LSH + connected
  * components. That gap is what the 0.05 P/R slack is for.
  */
object RefOracle {

  final case class Page(url: String, docId: Long, html: Array[Byte], lang: String)
  final case class Result(
      textByUrl: Map[String, String],
      shaByUrl: Map[String, String],
      mentions: Vector[(String, Int, String, String, Int, Int)], // url, sentIdx, mention, etype, begin, end
      triples: Set[(String, String, String)])

  def extract(html: Array[Byte]): String = Text.extractText(html)

  def canon(mention: String): String = Fixture.aliasOf.getOrElse(mention, mention)

  def process(pages: Seq[Page], model: HmmModel = Fixture.model): Result = {
    val textByUrl = Map.newBuilder[String, String]
    val shaByUrl = Map.newBuilder[String, String]
    val mentions = Vector.newBuilder[(String, Int, String, String, Int, Int)]
    val triples = Set.newBuilder[(String, String, String)]
    pages.foreach { p =>
      val text = extract(p.html)
      textByUrl += p.url -> text
      shaByUrl += p.url -> Text.sha256Hex(text)
      if (p.lang == "zh") {
        Text.splitSentences(text).zipWithIndex.foreach { case (sent, si) =>
          val chars = sent.toCharArray
          val tags = Hmm.viterbi(model, chars)
          val spans = Bio.decode(sent, tags)
          spans.foreach(s => mentions += ((p.url, si, s.mention, s.etype, s.begin, s.end)))
          Templates.extract(sent, spans).foreach { t =>
            triples += ((canon(t.subj), t.pred, canon(t.obj)))
          }
        }
      }
    }
    Result(textByUrl.result(), shaByUrl.result(), mentions.result(), triples.result())
  }

  /** Oracle run over the synthesized pages for doc ids [0, n) using the
    * fixture zh corpus for zh rows and `docText` otherwise — mirrors
    * graft.sources.Pages synthesis exactly. */
  def pagesFor(docs: Seq[(Long, String, String, String)]): Seq[Page] =
    docs.map { case (docId, text, lang, source) =>
      Page(Fixture.pageUrl(docId, source), docId,
        Fixture.pageHtml(docId, Fixture.pageBody(docId, text, lang)), lang)
    }
}
