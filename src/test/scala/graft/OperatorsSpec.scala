package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Hashing, TextStats}
import graft.operators._

class TextStatsSpec extends AnyFunSuite {
  test("word ngrams: distinct, sorted, short-text fallback") {
    assert(TextStats.wordNgrams("a b c d", 3).toSet == Set("a b c", "b c d"))
    assert(TextStats.wordNgrams("a b", 3).toSet == Set("a b"))
    assert(TextStats.wordNgrams("", 3).isEmpty)
  }
  test("simhash: near-identical texts within small hamming distance") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a + " extra"
    assert(TextStats.hamming(TextStats.simhash(a), TextStats.simhash(b)) <= 8)
    // very different texts far apart
    val c = "completely unrelated words here about databases and query engines"
    assert(TextStats.hamming(TextStats.simhash(a), TextStats.simhash(c)) > 10)
    // deterministic
    assert(TextStats.simhash(a) == TextStats.simhash(a))
  }
  test("simhash bands: hamming<=3 pair shares at least one band (pigeonhole)") {
    val h1 = 0x123456789abcdef0L
    val h2 = h1 ^ 0x8001L ^ (1L << 40) // 3 bits flipped
    val b1 = TextStats.simhashBands(h1)
    val b2 = TextStats.simhashBands(h2)
    assert(b1.zip(b2).exists { case (x, y) => x == y })
  }
  test("fingerprint: whitespace-insensitive, content-sensitive") {
    assert(TextStats.fingerprint("a b  c") == TextStats.fingerprint("a b c"))
    assert(TextStats.fingerprint("a b c") != TextStats.fingerprint("a b d"))
  }
  test("langId: planted texts per language") {
    assert(TextStats.langId("the cat is in the house and it is warm") == "en")
    assert(TextStats.langId("der hund ist nicht in das haus und die katze") == "de")
    assert(TextStats.langId("el perro es un animal y la casa es grande") == "es")
    assert(TextStats.langId("le chien est dans la maison et le chat est la") == "fr")
    assert(TextStats.langId("北京大学位于北京。") == "zh")
    assert(TextStats.langId("12345 67890") == "und")
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val corpus = Dedup.planted(docs)

  test("exact dedup finds exactly the planted exact copies") {
    val groups = Dedup.exactGroups(corpus).collect()
    val expected = docs.filter(col("doc_id") % 7 === 0).count()
    assert(groups.length == expected)
    assert(groups.forall(_.getLong(1) == 2)) // each group: original + copy
    // keep-list: one row per distinct text
    val total = corpus.count()
    assert(Dedup.exactKeep(corpus).count() == total - expected)
  }

  test("ngram jaccard finds planted near+exact pairs, no random-pair FPs") {
    val pairs = Dedup.ngramJaccardPairs(corpus).as[(Long, Long, Double)].collect()
    val near = docs.filter(col("doc_id") % 5 === 0).select("doc_id").as[Long].collect()
    near.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 2000000L),
        s"missing planted near-pair for $id")
    }
    // emitted pairs all satisfy the threshold and canonical ordering
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0.5))
    // (the driver's filler corpus CAN contain natural near-dups — those
    // are legitimate output, so no no-natural-pairs assertion here)
  }

  test("minhash LSH recall vs exact ngram jaccard is >= 0.95 and precision 1.0") {
    val exact = Dedup.ngramJaccardPairs(corpus)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(corpus)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // precision: every LSH pair passes the exact-jaccard verify, so it
    // must also be in the exhaustive exact set
    assert(lsh.subsetOf(exact), s"LSH emitted non-exact pairs: ${lsh.diff(exact).take(3)}")
    assert(lsh.size.toDouble / exact.size >= 0.95,
      s"LSH recall ${lsh.size}/${exact.size}")
  }

  test("wordless documents pair with each other (sentinel sketches), not with real docs") {
    // empty/whitespace-only texts yield the all-sentinel minhash
    // signature and simhash 0, so they bucket together and pass verify
    // (jaccard(∅,∅)=1.0, hamming 0). The DuckDB oracles carry explicit
    // wordless-doc branches mirroring exactly this — keep them in sync.
    val docs = Seq((1L, ""), (2L, " \t "), (3L, "real content words here now"))
      .toDF("doc_id", "text")
    val mh = Dedup.minhashPairs(docs).as[(Long, Long, Double)].collect().toSet
    assert(mh == Set((1L, 2L, 1.0)), s"minhash wordless pairing: $mh")
    val sh = Dedup.simhashPairs(docs).as[(Long, Long, Int)].collect().toSet
    assert(sh.contains((1L, 2L, 0)), s"simhash wordless pairing: $sh")
    assert(sh.forall(p => p._1 == 1L && p._2 == 2L || p._3 > 0), s"real doc glued to empties: $sh")
  }

  test("simhash finds planted exact pairs (hamming 0)") {
    val pairs = Dedup.simhashPairs(corpus).as[(Long, Long, Int)].collect()
    val exactIds = docs.filter(col("doc_id") % 7 === 0).select("doc_id").as[Long].collect()
    exactIds.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 1000000L && p._3 == 0))
    }
  }

  test("embedding cosine: LSH-bucketed equals exact on planted scaled copies") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.unionByName(base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001)).as("embedding")))
    val exact = Dedup.embedCosinePairs(planted, 0.99, planes = 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embedCosinePairs(planted, 0.99, planes = 6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact == lsh) // scaling preserves sign buckets → full recall
    assert(exact.nonEmpty)
    assert(exact.forall { case (a, b) => b == a + 1000000L })
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  test("brute-force topk: k rows per query, ranks 1..k, cos descending") {
    val res = Similarity.bruteForceTopK(emb, 0L until 10L, 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(res.length == 50)
    res.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5))
      assert(sorted.sliding(2).forall(p => p.head._3 >= p.last._3))
    }
  }

  test("lsh topk recall@5 beats its candidate-fraction baseline") {
    // Near-orthogonal random vectors are LSH's worst case: recall is
    // bounded by how much of the corpus the probes reach. planes=4 →
    // 16 buckets; 4 probes ≈ 25% of the corpus scanned. The test
    // asserts the machinery beats random candidate selection.
    val brute = Similarity.bruteForceTopK(emb, 0L until 10L, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, 0L until 10L, 5, planes = 4, probes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    info(f"ANN recall@5 = $recall%.2f (candidate fraction ~0.25)")
    assert(recall >= 0.3, f"recall $recall%.2f should beat the ~0.25 scan fraction")
  }

  test("margin-ordered multi-probe recall >= bit-flip baseline at fixed probe budget") {
    // Standard multi-probe LSH (Lv et al. 2007): at a fixed probe
    // budget, flipping the planes the query was CLOSEST to (smallest
    // |dot| margin) reaches the buckets most likely to hide true
    // neighbors. 50 queries stabilize the comparison on this corpus.
    val qs = 0L until 50L
    val brute = Similarity.bruteForceTopK(emb, qs, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(margin: Boolean): Double = {
      val lsh = Similarity.lshTopK(emb, qs, 5, planes = 4, probes = 4,
          marginProbes = margin)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      brute.intersect(lsh).size.toDouble / brute.size
    }
    val rMargin = recall(margin = true)
    val rBitflip = recall(margin = false)
    info(f"recall@5 margin-ordered=$rMargin%.3f bit-flip=$rBitflip%.3f (probes=4, planes=4)")
    assert(rMargin >= rBitflip,
      f"margin probing ($rMargin%.3f) must not lose to unconditional bit flips ($rBitflip%.3f)")
  }

  test("ivf with nprobe == nlist degenerates to EXACT brute force") {
    // each corpus row lives in exactly one list, so probing every list
    // scores every pair exactly once — identical to the brute path for
    // ANY centroids (robust to float-sum partition order in k-means)
    val brute = Similarity.bruteForceTopK(emb, 0L until 10L, 5)
    val ivf = Similarity.ivfTopK(emb, 0L until 10L, 5, nlist = 8, nprobe = 8, iters = 3)
    assert(ivf.exceptAll(brute).isEmpty && brute.exceptAll(ivf).isEmpty)
  }

  test("ivf recall@5 beats its scanned-fraction baseline at nprobe/nlist = 1/4") {
    val qs = 0L until 50L
    val brute = Similarity.bruteForceTopK(emb, qs, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, qs, 5, nlist = 16, nprobe = 4, iters = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f (scanned fraction ~0.25 of 16 lists)")
    assert(recall >= 0.3, f"recall $recall%.2f should beat the ~0.25 scan fraction")
  }

  test("kmeans: nlist centroids, deterministic init, every vector assignable") {
    val c1 = Similarity.kmeansCentroids(emb, 8, 0, seed = 7L)
    val c2 = Similarity.kmeansCentroids(emb, 8, 0, seed = 7L)
    assert(c1.length == 8 && c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "iters=0 init must be deterministic")
    val cIter = Similarity.kmeansCentroids(emb, 8, 4, seed = 7L)
    assert(cIter.length == 8 && cIter.forall(_.length == c1.head.length))
  }

  test("cosineCol matches scalar cosine") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val got = df.select(Similarity.cosineCol(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - Dedup.cosine(Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))) < 1e-12)
  }

  test("partial top-k: <= k*|queries| rows per partition; two-level == plain window") {
    val k = 5
    val queries = 0L until 10L
    val scored = Similarity.bruteScored(emb, queries)
    // the map-side bound that makes the final exchange tiny
    val perPart = Similarity.partialTopK(scored, k)
      .groupBy(spark_partition_id().as("p")).count()
      .as[(Int, Long)].collect()
    assert(perPart.nonEmpty)
    assert(perPart.forall(_._2 <= k * queries.size),
      s"partition emitted more than k*|queries| rows: ${perPart.maxBy(_._2)}")
    // exactness: the heap path reproduces the full-shuffle window path
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    val windowed = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rk"))
      .as[(Long, Long, Double, Int)].collect().toSet
    val heaped = Similarity.topK(scored, k)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(heaped == windowed)
  }

  test("zero-norm vector: cosine is 0.0 (not ANSI crash); heap == window") {
    // without cosineCol's guard, ANSI mode turns the 0/0 into a
    // job-killing DIVIDE_BY_ZERO; with it, zero vectors score 0.0
    // (scalar Dedup.cosine convention) and both top-k paths agree
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val poisoned = emb.select(col("vec_id"), col("embedding")).unionByName(
      Seq((999999L, Array.fill(dims)(0.0))).toDF("vec_id", "embedding"))
    val scored = Similarity.bruteScored(poisoned, 0L until 5L)
    assert(scored.filter(col("vec_id") === 999999L)
      .select("cos").as[Double].collect().forall(_ == 0.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    val windowed = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rk"))
      .as[(Long, Long, Double, Int)].collect().toSet
    val heaped = Similarity.topK(scored, 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(heaped == windowed)
  }

  test("auto planes bound bucket occupancy; recall measured at two corpus sizes") {
    assert(Similarity.autoPlanes(1L << 12) == 4) // floor
    assert(Similarity.autoPlanes(1L << 20) == 8)
    assert(Similarity.autoPlanes(1000000000000L) == 28)
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val n = e.count()
      val planes = Similarity.autoPlanes(n)
      val occ = Similarity.bucketOccupancy(e, planes)
        .as[(Long, Long)].collect()
      val maxOcc = occ.map(_._2).max
      val brute = Similarity.bruteForceTopK(e, 0L until 10L, 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val lsh = Similarity.lshTopK(e, 0L until 10L, 5, planes = 0, probes = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = brute.intersect(lsh).size.toDouble / brute.size
      info(f"$sf: n=$n planes=$planes buckets=${occ.length} maxOcc=$maxOcc recall@5=$recall%.2f")
      // random near-orthogonal vectors are LSH's worst case; the gate is
      // "beats the probed candidate fraction", same as the planes=4 test
      assert(recall >= 0.3, f"$sf recall $recall%.2f")
      // the designed invariant: EXPECTED occupancy n/2^planes stays
      // within the target regardless of corpus size
      assert(n.toDouble / (1L << planes) <= 4096.0, "expected occupancy above target")
    }
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("quality metrics on a known text") {
    val df = Seq((1L, "Hello World 42 ok")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(df).head()
    assert(r.getLong(1) == 17) // n_chars
    assert(r.getLong(2) == 4)  // n_words
    assert(r.getDouble(4) == 0.1176) // digit_ratio 2/17
    assert(r.getDouble(6) == 0.1176) // upper_ratio 2/17
  }
  test("token counts on known text") {
    val df = Seq((1L, "ab cd-12 x!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).head()
    assert(r.getInt(1) == 3)
    // ab | cd | - | 12 | x | !  → 6 bpe-ish tokens
    assert(r.getInt(2) == 6)
  }
  test("fingerprints deterministic across runs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextAnalysis.fingerprints(docs).as[(Long, Long, Int)].collect().sortBy(_._1)
    val b = TextAnalysis.fingerprints(docs).as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("chunking: starts/overlap/tail, empty doc yields no chunks") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, ""),
      (3L, "only")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(df, chunkWords = 4, strideWords = 3)
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1: starts 0,3,6,9 -> 4 chunks; the short tail chunk is kept
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3)).toSeq == Seq(
      (0, "w1 w2 w3 w4"), (1, "w4 w5 w6 w7"), (2, "w7 w8 w9 w10"), (3, "w10")))
    assert(got.filter(_._1 == 1L).map(_._4).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(!got.exists(_._1 == 2L), "empty doc must yield no chunks")
    assert(got.filter(_._1 == 3L).map(r => (r._2, r._3)).toSeq == Seq((0, "only")))
  }

  test("removeFrequentTerms drops exactly the >=threshold terms, order kept") {
    // 'the' is 50% of tokens; everything else is rare
    val docs = Seq(
      (1L, "the quick the fox the jumps"),
      (2L, "the lazy the dog the sleeps")).toDF("doc_id", "text")
    val got = TextAnalysis.removeFrequentTerms(docs, k = 8, pctTimes100 = 2000)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "quick fox jumps"), (2L, "lazy dog sleeps")))
  }

  test("PII redaction: all three types, multiples, identity on clean text") {
    def red(s: String): String = TextAnalysis.redactPii(
      Seq((1L, s)).toDF("doc_id", "text")).select("text").as[String].head()
    assert(red("mail a.b+c@sub.example.co or x@y.org now") ==
      "mail <EMAIL> or <EMAIL> now")
    assert(red("call 555-867-5309 or 555 123 4567.") ==
      "call <PHONE> or <PHONE>.")
    assert(red("host 192.168.0.1 and 10.0.0.7;") == "host <IP> and <IP>;")
    // email precedence: the digits inside a local part are consumed by
    // the email token, not half-eaten by the phone/ip patterns
    assert(red("u555-867-5309x@example.org") == "<EMAIL>")
    // identity on clean text — including digit runs that are NOT PII
    val clean = "version 3.14 shipped in 2024, build 1234567 ok"
    assert(red(clean) == clean)
  }
}

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.core.Bpe

  test("merge learning on the classic Sennrich word-freq example") {
    // {low:5, lower:2, newest:6, widest:3}: (e,s) and (s,t</w>) both
    // score 9; the deterministic lexicographic tie-break picks (e,s)
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.train(wf, 4)
    assert(m.merges.head == ("e", "s"))
    assert(m.merges(1) == ("es", "t</w>")) // now the unique max (9)
    // after enough merges, the most frequent word's stem contracts
    val m10 = Bpe.train(wf, 10)
    assert(m10.encodeWord("newest").length < "newest".length)
    // encode is a partition of the word: concatenated tokens == word + </w>
    for (w <- Seq("newest", "lowest", "wider", "low"))
      assert(m10.encodeWord(w).mkString == w + Bpe.Eow)
  }

  test("zero merges degrade to characters; unseen chars stay singletons") {
    val m = Bpe.Model(Vector.empty)
    assert(m.encodeWord("abc") == Vector("a", "b", "c" + Bpe.Eow))
    assert(m.encodeWord("") == Vector.empty)
  }

  test("distributed memoized counts equal direct driver-side encode") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = graft.operators.TextAnalysis.trainBpe(docs, numMerges = 50)
    assert(model.merges.size == 50)
    val got = graft.operators.TextAnalysis.bpeTokens(docs, model)
      .as[(Long, Int)].collect().toMap
    val direct = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) =>
        id -> graft.core.TextStats.words(t).map(model.tokenCount).sum
      }.toMap
    assert(got == direct)
    // BPE with merges never exceeds the char count and is >= word count
    val words = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> graft.core.TextStats.words(t) }.toMap
    assert(got.forall { case (id, n) =>
      n >= words(id).length && n <= words(id).map(_.length).sum })
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val blobs = Multimodal.synthesize(docs)

  test("blob synthesis: deterministic, modality from doc_id") {
    val a = blobs.collect().sortBy(_.doc_id)
    val b = Multimodal.synthesize(docs).collect().sortBy(_.doc_id)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id == y.doc_id && x.modality == y.modality)
      assert(java.util.Arrays.equals(x.payload, y.payload))
    }
    assert(a.map(_.modality).toSet == Set("image", "audio", "video"))
  }

  test("meta parses header; schema is typed") {
    val m = Multimodal.meta(blobs)
    assert(m.schema.fieldNames.toSeq ==
      Seq("doc_id", "modality", "width", "height", "n_frames", "n_bytes"))
    val rows = m.collect()
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
    assert(rows.filter(_.modality == "video").forall(_.n_frames >= 2))
    assert(rows.filter(_.modality != "video").forall(_.n_frames == 1))
  }

  test("features: fixed dims, L1-normalized") {
    val f = Multimodal.features(blobs).collect()
    assert(f.forall(_.features.length == 16))
    assert(f.forall(x => math.abs(x.features.sum - 1.0) < 1e-9))
  }

  test("frame sampling: stride-2 frames with correct sizes") {
    val metas = Multimodal.meta(blobs).collect()
      .filter(_.modality == "video").map(m => m.doc_id -> m).toMap
    val frames = Multimodal.sampleFrames(blobs, 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { fr =>
      val m = metas(fr.doc_id)
      assert(fr.frame_idx % 2 == 0 && fr.frame_idx < m.n_frames)
      assert(fr.frame_bytes.length == m.width * m.height)
    }
    val expected = metas.values.map(m => (m.n_frames + 1) / 2).sum
    assert(frames.length == expected)
  }
}

class HashingSpec extends AnyFunSuite {
  test("minhash estimates jaccard within tolerance") {
    val a = (1 to 100).map("a" + _).toArray
    val b = ((1 to 80).map("a" + _) ++ (1 to 20).map("b" + _)).toArray
    val ma = Hashing.minhash(a, 128)
    val mb = Hashing.minhash(b, 128)
    val est = ma.zip(mb).count(p => p._1 == p._2).toDouble / 128
    val truth = Hashing.jaccard(a, b) // 80/120 ≈ 0.667
    assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
  }
  test("band keys: equal signatures share all bands, disjoint share none") {
    val s1 = Array.tabulate(32)(i => i.toLong)
    val s2 = Array.tabulate(32)(i => i.toLong + 1000)
    assert(Hashing.bandKeys(s1, 16).sameElements(Hashing.bandKeys(s1, 16)))
    assert(!Hashing.bandKeys(s1, 16).zip(Hashing.bandKeys(s2, 16)).exists(p => p._1 == p._2))
  }
}
