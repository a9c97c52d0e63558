package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Bpe, TextStats}

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Quality and token metrics are pure Column expressions — they stay
  * inside whole-stage codegen, and a projection-only pass over 100 TB
  * of text is scan-bound, which is the right bottleneck. Language ID
  * and fingerprinting need per-char/per-word loops, so they run as
  * typed map over a narrow projection (doc_id, text).
  */
object TextAnalysis {

  /** Quality metrics, all codegen'd Column expressions:
    *  n_chars, n_words, mean_word_len, digit_ratio, space_ratio,
    *  upper_ratio and a composite [0,1] quality score.
    * Ratios rounded to 4 decimals (stable vs the DuckDB oracle). */
  def quality(docs: DataFrame): DataFrame = {
    val len = length(col("text")).cast("double")
    val nWords = size(split(col("text"), " +")).cast("double")
    val digits = len - length(regexp_replace(col("text"), "[0-9]", "")).cast("double")
    val spaces = len - length(regexp_replace(col("text"), " ", "")).cast("double")
    val uppers = len - length(regexp_replace(col("text"), "[A-Z]", "")).cast("double")
    val meanWordLen = (len - spaces) / nWords
    // crude composite: long-enough docs with word-like shape score high
    val score = least(lit(1.0), nWords / lit(50.0)) *
      (lit(1.0) - digits / len) *
      when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.5)
    docs.select(
      col("doc_id"),
      len.cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(digits / len, 4).as("digit_ratio"),
      round(spaces / len, 4).as("space_ratio"),
      round(uppers / len, 4).as("upper_ratio"),
      round(score, 4).as("quality"))
  }

  /** Token counts: whitespace tokens plus a BPE-ish regex tokenization
    * (letter runs / digit runs / single other non-space). Both are
    * Column-only (regexp_extract_all is codegen'd). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " +")).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
        .as("bpe_tokens"))

  /** Language ID via the deterministic n-gram/stopword heuristic. */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, TextStats.langId(t)) }
      .toDF("doc_id", "lang_guess")
  }

  /** Real BPE training (graft.core.Bpe): the distributed part is ONE
    * groupBy(word).count over the corpus — the word dict is sublinear
    * in corpus size and capped at maxWords by (freq desc, word asc)
    * for determinism; the sequential merge loop runs driver-side over
    * that small dict, as public BPE trainers do. */
  def trainBpe(docs: DataFrame, numMerges: Int = 200,
               maxWords: Int = 50000): Bpe.Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)].collect().toSeq
    Bpe.train(wf, numMerges)
  }

  /** Per-doc REAL BPE token counts: ranks broadcast once per executor,
    * per-partition word→count memo (Zipf ⇒ high hit rate), narrow. */
  def bpeTokens(docs: DataFrame, model: Bpe.Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, t) =>
          var n = 0
          TextStats.words(t).foreach { w =>
            n += memo.getOrElseUpdate(w, m.tokenCount(w))
          }
          (id, n)
        }
      }
      .toDF("doc_id", "bpe_real_tokens")
  }

  /** Rolling-hash document fingerprint + winnowed sketch size. The
    * fingerprint is whitespace-insensitive (word sequence hash), so
    * reformatted copies collide — cheaper than MinHash when only
    * re-flow dedup is needed. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, TextStats.fingerprint(t), TextStats.winnow(t).length) }
      .toDF("doc_id", "fingerprint", "sketch_size")
  }

  /** PII patterns shared by [[redactPii]] and its DuckDB oracle — kept
    * to the regex intersection of Java's engine and RE2 (character
    * classes, bounded repetition, \b) so both engines match the SAME
    * substrings. Order matters: emails first (their local parts can
    * contain digit runs a later pattern might chew). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\b\d{3}[-. ]\d{3}[-. ]\d{4}\b""" -> "<PHONE>",
    """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""" -> "<IP>")

  /** PII redaction — the corpus-cleaning pass every training-data
    * pipeline runs before anything else sees the text. Pure chained
    * `regexp_replace` Column expressions (codegen'd, narrow, no UDF);
    * emails / NANP-style phone numbers / IPv4 literals are replaced by
    * type tokens so downstream dedup and tokenization stay stable
    * across redacted variants of the same document. Pattern set is the
    * deliberately-conservative high-precision core — extend
    * [[PiiPatterns]] per deployment; recall-heavy PII (names,
    * addresses) needs an NER pass, which is what the KG pipeline's
    * tagger is for. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol,
      PiiPatterns.foldLeft(col(textCol)) { case (c, (pat, repl)) =>
        regexp_replace(c, pat, repl)
      })

  /** Context-window chunking — the packing step that feeds tokenizers:
    * each document becomes overlapping windows of `chunkWords`
    * whitespace tokens, starting every `strideWords` (stride <
    * chunkWords ⇒ overlap, the standard long-document recipe so no
    * span is split across every chunk boundary it appears near). Pure
    * Column expressions: split → sequence of window starts → transform
    * + slice → posexplode. Narrow (each doc expands independently, no
    * shuffle until the caller aggregates); empty documents produce no
    * chunks. The trailing window is kept even when shorter than
    * `chunkWords` (standard: the tail tokens must land somewhere). */
  def chunk(docs: DataFrame, chunkWords: Int, strideWords: Int): DataFrame = {
    require(chunkWords >= 1 && strideWords >= 1 && strideWords <= chunkWords,
      "need 1 <= strideWords <= chunkWords")
    val ws = filter(split(col("text"), "\\s+"), w => w =!= "")
    val n = size(ws)
    // starts: 0, stride, 2*stride, ... while start < n (none if n == 0)
    // floor((n-1)/stride): n >= 1 in this branch, so the floored double
    // division equals integer division (and DuckDB's `//`)
    val starts = when(n === 0, array().cast("array<int>"))
      .otherwise(transform(
        sequence(lit(0), floor((n - 1) / strideWords).cast("int")),
        i => i * strideWords))
    // n_words comes from the slice itself (codegen CSEs the two slice
    // references) — re-splitting the joined chunk string would pay a
    // second regex pass per chunk on the corpus-sized path
    docs
      .withColumn("__ws", ws)
      .select(col("doc_id"),
        posexplode(transform(starts, s => struct(
          array_join(slice(col("__ws"), s + 1, lit(chunkWords)), " ").as("chunk"),
          size(slice(col("__ws"), s + 1, lit(chunkWords))).cast("long").as("n_words")))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        col("col.chunk").as("chunk"), col("col.n_words").as("n_words"))
  }

  /** Corpus-frequency stopword filtering (the C4-style boilerplate
    * rule: drop tokens that blanket the corpus): removes every term at
    * or above the support threshold from every document, term set
    * computed EXACTLY by [[frequentTerms]] (MG sketch proposes, exact
    * recount decides). The ≤ k filtered terms ride to executors as an
    * array literal inside a codegen'd higher-order `filter` — narrow,
    * no join, original token order preserved. */
  def removeFrequentTerms(docs: DataFrame, k: Int, pctTimes100: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freq = frequentTerms(docs, k, pctTimes100)
      .select("word").as[String].collect()
    val freqLit = typedlit(freq)
    docs.select(col("doc_id"),
      array_join(
        filter(split(col("text"), "\\s+"),
          w => w =!= "" && !array_contains(freqLit, w)), " ").as("text"))
  }

  /** Corpus-wide frequent terms, EXACTLY: every whitespace token whose
    * count clears `pctTimes100`/100 percent of all tokens, with its
    * exact count. Two narrow passes, no full-vocabulary shuffle:
    *
    *   1. ONE aggregation computes the Misra-Gries candidate set
    *      ([[graft.functions.freqItems]], O(k) state per partial
    *      buffer, map-side combined) AND the total token count — the
    *      only driver materialization is ≤ k strings + one long;
    *   2. exact recount of candidates only: broadcast the candidate
    *      list, semi-join the token stream, groupBy over ≤ k keys,
    *      integer-exact threshold filter (`100·cnt ≥ pct·n` — no
    *      floating point).
    *
    * Result EQUALS the full `groupBy(token) HAVING` answer whenever
    * `pctTimes100/100 ≥ 1/(k+1)` percent (the MG superset guarantee;
    * enforced), while a direct groupBy at corpus scale would shuffle
    * and materialize the entire (unbounded) vocabulary to answer a
    * question about the top handful.
    */
  def frequentTerms(docs: DataFrame, k: Int, pctTimes100: Int): DataFrame = {
    require(pctTimes100 >= 1 && pctTimes100 <= 10000, "pct must be in (0, 100]")
    // guarantee precondition, STRICT: MG only guarantees items with
    // f > n/(k+1); the final filter is >=, so at exact equality
    // (pct·(k+1) == 10000) a term with count exactly pct·n/10000 could
    // be evicted from the sketch yet belong in the exact answer
    require(pctTimes100.toLong * (k + 1) > 10000L,
      s"k=$k too small for a ${pctTimes100 / 100.0}% threshold: need k+1 > ${10000 / pctTimes100}")
    val words = docs
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val row = words
      .agg(graft.functions.freqItems(col("word"), k).as("cand"),
        count(lit(1)).as("n"))
      .head()
    val n = row.getLong(1)
    val cands = row.getSeq[String](0)
    val spark = docs.sparkSession
    import spark.implicits._
    val candDf = cands.toDF("word")
    words.join(broadcast(candDf), "word")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10000L >= lit(pctTimes100.toLong * n))
      .orderBy("word")
  }
}
