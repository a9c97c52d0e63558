package graft.core

/** A raw (pre-canonicalization) triple extracted from one sentence. */
final case class RawTriple(subj: String, subjType: String, pred: String,
                           obj: String, objType: String, ruleId: String)

/** A10 predicate-template extraction (FIXTURES.md §4, amended: trigger
  * must appear verbatim in the text BETWEEN two spans of the matching
  * types in the same sentence — the spans need not be adjacent, which is
  * required for template 4's (PER, lives_in, LOC) where an ORG span sits
  * between them). Shared by oracle and pipeline.
  */
object Templates {

  final case class Rule(id: String, trigger: String, pred: String,
                        subjType: String, objType: String)

  /** Frozen template table (FIXTURES.md §4). Order fixed — emission order
    * is deterministic. */
  val Rules: Vector[Rule] = Vector(
    Rule("r_works_at",  "任职于", "works_at",       "PER", "ORG"),
    Rule("r_born_in",   "出生于", "born_in",        "PER", "LOC"),
    Rule("r_located_in","位于",   "located_in",     "ORG", "LOC"),
    Rule("r_grad_from", "毕业于", "graduated_from", "PER", "ORG"),
    Rule("r_lives_in",  "现居",   "lives_in",       "PER", "LOC"))

  /** All ordered span pairs (i<j); for each rule with matching types whose
    * trigger occurs in the between-text, emit one triple. */
  def extract(sentence: String, spans: Seq[Span]): Vector[RawTriple] = {
    val out = Vector.newBuilder[RawTriple]
    val ss = spans.toIndexedSeq
    var i = 0
    while (i < ss.length) {
      var j = i + 1
      while (j < ss.length) {
        val a = ss(i)
        val b = ss(j)
        if (a.end <= b.begin) {
          val between = sentence.substring(a.end, b.begin)
          Rules.foreach { r =>
            if (r.subjType == a.etype && r.objType == b.etype &&
                between.contains(r.trigger))
              out += RawTriple(a.mention, a.etype, r.pred, b.mention, b.etype, r.id)
          }
        }
        j += 1
      }
      i += 1
    }
    out.result()
  }
}
