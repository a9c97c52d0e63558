package graft.core

/** Pure text-statistics functions for the training-data-pipeline
  * operators (dedup, language-ID, quality scoring, fingerprinting).
  * Kept Spark-free so unit tests and the oracle can call them directly;
  * the distributed operators invoke them inside typed map/mapPartitions.
  */
object TextStats {

  /** Whitespace word tokenization (runs of non-whitespace). */
  def words(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** Word n-gram shingles, distinct, sorted (sorted for LSH/MinHash
    * determinism). Space-joined — words cannot contain spaces, so grams are unambiguous. */
  def wordNgrams(text: String, n: Int): Array[String] = {
    val ws = words(text)
    if (ws.length < n) {
      if (ws.isEmpty) Array.empty else Array(ws.mkString(" "))
    } else {
      val set = scala.collection.mutable.SortedSet.empty[String]
      var i = 0
      while (i + n <= ws.length) {
        set += ws.slice(i, i + n).mkString(" ")
        i += 1
      }
      set.toArray
    }
  }

  /** 64-bit SimHash over word-unigram hashes: sign-sum of per-feature
    * bit vectors. Near-duplicate texts land within a small Hamming
    * distance; blocking on 16-bit sub-bands finds all pairs with
    * distance ≤ 3 (4 bands — by pigeonhole one band must match). */
  def simhash(text: String): Long = {
    val acc = new Array[Int](64)
    val ws = words(text)
    var i = 0
    while (i < ws.length) {
      val h = Hashing.hash64(ws(i), 0x51a7ea5eL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** The 4 16-bit bands of a simhash — equality on any band blocks the
    * pair (catches all pairs with Hamming distance ≤ 3). Band index is
    * mixed into the key so equal values in different bands never meet. */
  def simhashBands(h: Long): Array[Long] =
    Array.tabulate(4)(b => (b.toLong << 32) | ((h >>> (16 * b)) & 0xffffL))

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Karp-Rabin-style rolling document fingerprint: polynomial hash of
    * the word sequence (order-sensitive, whitespace-insensitive), plus
    * winnowed k-gram minima for robust containment checks. */
  def fingerprint(text: String): Long = {
    var h = 0L
    val ws = words(text)
    var i = 0
    while (i < ws.length) {
      h = h * 1000003L + Hashing.hash64(ws(i), 0xf17e0L)
      i += 1
    }
    Hashing.splitmix64(h ^ ws.length)
  }

  /** Winnowing (Schleimer et al. 2003, public): min word-4-gram rolling
    * hash per window of w=4 — a compact sketch whose overlap estimates
    * containment between documents. */
  def winnow(text: String, k: Int = 4, w: Int = 4): Array[Long] = {
    val ws = words(text)
    if (ws.length < k) return if (ws.isEmpty) Array.empty else Array(fingerprint(text))
    val grams = new Array[Long](ws.length - k + 1)
    var i = 0
    while (i + k <= ws.length) {
      var h = 0L
      var j = i
      while (j < i + k) { h = h * 1000003L + Hashing.hash64(ws(j), 0xf17e0L); j += 1 }
      grams(i) = Hashing.splitmix64(h)
      i += 1
    }
    val out = scala.collection.mutable.SortedSet.empty[Long]
    i = 0
    while (i + w <= grams.length || (i == 0 && grams.nonEmpty)) {
      val end = math.min(i + w, grams.length)
      var mn = Long.MaxValue
      var j = i
      while (j < end) { if (grams(j) < mn) mn = grams(j); j += 1 }
      out += mn
      i += 1
    }
    out.toArray
  }

  // ---- language ID (n-gram/stopword heuristic; deterministic) ----

  private val stop: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Set("le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"))

  /** CJK-ratio → zh; else best stopword-hit-rate among {en,de,es,fr};
    * deterministic tie-break by language code; "und" (undetermined) when
    * nothing matches. */
  def langId(text: String): String = {
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4E00 && c <= 0x9FFF) { cjk += 1; letters += 1 }
      else if (Character.isLetter(c)) letters += 1
      i += 1
    }
    if (letters == 0) return "und"
    if (cjk.toDouble / letters > 0.2) return "zh"
    val ws = words(text.toLowerCase).filter(_.nonEmpty)
    if (ws.isEmpty) return "und"
    val best = stop.toSeq.sortBy(_._1).map { case (lang, sw) =>
      (lang, ws.count(sw.contains).toDouble / ws.length)
    }.maxBy(_._2)
    if (best._2 > 0.0) best._1 else "und"
  }
}
