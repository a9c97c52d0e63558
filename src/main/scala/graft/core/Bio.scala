package graft.core

/** An entity span inside one sentence. `begin` inclusive, `end` exclusive,
  * both char offsets into the sentence. */
final case class Span(mention: String, etype: String, begin: Int, end: Int)

/** BIO tag scheme over the 7-tag set (FIXTURES.md §4):
  * O, B-PER, I-PER, B-ORG, I-ORG, B-LOC, I-LOC. Char-level.
  * Shared by the oracle and the Spark pipeline.
  */
object Bio {

  val Tags: Array[String] =
    Array("O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC")

  /** spans → per-char BIO tags. Spans must be non-overlapping, sorted. */
  def encode(sentLen: Int, spans: Seq[Span]): Array[String] = {
    val tags = Array.fill(sentLen)("O")
    spans.foreach { s =>
      var i = s.begin
      while (i < s.end && i < sentLen) {
        tags(i) = (if (i == s.begin) "B-" else "I-") + s.etype
        i += 1
      }
    }
    tags
  }

  /** BIO decode (A9, FIXTURES.md §4): maximal runs; an I-X without a
    * preceding B-X/I-X of the same type starts a new span (treated as
    * B-X). Deterministic; shared with the oracle. */
  def decode(sentence: String, tags: Array[String]): Vector[Span] = {
    val out = Vector.newBuilder[Span]
    var start = -1
    var curType: String = null
    var i = 0
    def close(end: Int): Unit = {
      if (curType != null) {
        out += Span(sentence.substring(start, end), curType, start, end)
        curType = null; start = -1
      }
    }
    while (i < tags.length) {
      val t = tags(i)
      if (t == "O" || t.length < 3) close(i)
      else {
        val etype = t.substring(2)
        val isB = t.charAt(0) == 'B'
        if (isB || curType == null || curType != etype) { close(i); start = i; curType = etype }
        // I-X continuing current span of same type: nothing to do
      }
      i += 1
    }
    close(tags.length)
    out.result()
  }
}
