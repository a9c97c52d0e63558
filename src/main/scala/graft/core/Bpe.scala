package graft.core

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — public algorithm).
  * Learns merge rules from a word-frequency dictionary; encodes a word
  * by repeatedly merging its lowest-rank adjacent symbol pair.
  *
  * Scale shape: the merge LOOP is inherently sequential, but its input
  * is the distinct-word frequency dict — sublinear in corpus size
  * (Heaps' law) and capped at maxWords — computed by ONE distributed
  * groupBy(word).count (TextAnalysis.trainBpe). Training then runs
  * driver-side over that small dict, which is how public BPE trainers
  * work (they consume word-frequency tables, not raw corpora).
  * Encoding is embarrassingly parallel: ranks broadcast once per
  * executor, applied in mapPartitions with a per-partition word→count
  * memo (Zipf makes the hit rate high).
  *
  * Deterministic throughout: merge selection is (max frequency, then
  * lexicographic pair); no RNG, no hash-order dependence.
  */
object Bpe {

  /** End-of-word marker, attached to a word's final character so merges
    * can distinguish word-final from word-internal contexts. */
  val Eow = "</w>"

  final case class Model(merges: Vector[(String, String)]) extends Serializable {
    @transient lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Greedy lowest-rank-first merging — the standard BPE encode. */
    def encodeWord(word: String): Vector[String] = {
      if (word.isEmpty) return Vector.empty
      var syms = toSymbols(word)
      var continue = syms.length > 1
      while (continue) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var j = 0
        while (j + 1 < syms.length) {
          val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = j }
          j += 1
        }
        if (bestIdx < 0) continue = false
        else {
          val pair = (syms(bestIdx), syms(bestIdx + 1))
          syms = mergePair(syms, pair)
          continue = syms.length > 1
        }
      }
      syms
    }

    def tokenCount(word: String): Int = encodeWord(word).length
  }

  private def toSymbols(word: String): Vector[String] = {
    val syms = word.map(_.toString).toVector
    if (syms.isEmpty) syms else syms.init :+ (syms.last + Eow)
  }

  private def mergePair(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Learn up to numMerges merge rules from a word-frequency dict. */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Model = {
    var words: Vector[(Vector[String], Long)] =
      wordFreq.toVector.collect { case (w, f) if w.nonEmpty => (toSymbols(w), f) }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var j = 0
        while (j + 1 < syms.length) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergePair(syms, best), f) }
        i += 1
      }
    }
    Model(merges.result())
  }
}
