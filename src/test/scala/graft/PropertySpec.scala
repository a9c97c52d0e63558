package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.ConnectedComponents

/** Property-based tests (SURVEY.md §5.3): invariants that must hold for
  * ALL inputs, checked over ScalaCheck-generated cases. Deterministic:
  * fixed ScalaCheck seed via initialSeed. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(prop: Prop, cases: Int = 100): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(cases)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // ---- Viterbi path optimality ----

  private def pathScore(m: HmmModel, chars: Array[Char], tags: Array[Int]): Double = {
    var s = m.logPi(tags(0)) +
      m.logB(tags(0)).getOrElse(chars(0), m.logBUnk(tags(0)))
    var i = 1
    while (i < chars.length) {
      s += m.logA(tags(i - 1))(tags(i)) +
        m.logB(tags(i)).getOrElse(chars(i), m.logBUnk(tags(i)))
      i += 1
    }
    s
  }

  test("property: Viterbi path scores >= any random path's score") {
    val m = Fixture.model
    val seenChars = m.logB.iterator.flatMap(_.keysIterator).toVector.distinct
    val genChar = Gen.frequency(
      4 -> Gen.oneOf(seenChars),
      1 -> Gen.choose('a', 'z')) // unseen → logBUnk branch exercised too
    val genSent = Gen.nonEmptyListOf(genChar).map(_.take(12).toArray)
    val genCase = for {
      chars <- genSent
      rand <- Gen.listOfN(chars.length, Gen.choose(0, m.tags.length - 1))
    } yield (chars, rand.toArray)
    check(Prop.forAll(genCase) { case (chars, randPath) =>
      val vit = Hmm.viterbi(m, chars).map(m.tagIndex)
      pathScore(m, chars, vit) >= pathScore(m, chars, randPath) - 1e-9
    })
  }

  // ---- BIO round-trip ----

  test("property: decode(encode(spans)) == spans for disjoint sorted spans") {
    val genSpans: Gen[(String, List[Span])] = for {
      len <- Gen.choose(1, 20)
      sent = Array.tabulate(len)(i => ('一' + i).toChar).mkString
      // random disjoint spans: walk left to right, skip/take
      spans <- {
        def loop(pos: Int): Gen[List[Span]] =
          if (pos >= len) Gen.const(Nil)
          else for {
            skip <- Gen.choose(0, 3)
            b = pos + skip
            res <- if (b >= len) Gen.const(Nil)
            else for {
              w <- Gen.choose(1, math.min(4, len - b))
              t <- Gen.oneOf("PER", "ORG", "LOC")
              rest <- loop(b + w)
            } yield Span(sent.substring(b, b + w), t, b, b + w) :: rest
          } yield res
        loop(0)
      }
    } yield (sent, spans)
    check(Prop.forAll(genSpans) { case (sent, spans) =>
      Bio.decode(sent, Bio.encode(sent.length, spans)).toList == spans
    })
  }

  // ---- extraction idempotence ----

  test("property: extractText idempotent whenever its output is markup-free") {
    // Unconditional idempotence is FALSE by design (found by this
    // property): entity decoding maps &lt; → '<', and a second pass
    // then treats that '<' as markup — true of any entity-decoding
    // extractor. The real invariant: one pass is a fixpoint whenever
    // its output carries no markup-significant chars.
    val genHtmlish = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("<p>", "</p>", "<script>x=1;</script>", "<style>a{}</style>",
        "&amp;", "&lt;", "  ", "\n", "\t", "。", "北京大学", "<b>", "</b>",
        "<!-- c -->", "&#20013;"))).map(_.mkString)
    // implication as a boolean (not `==>`): long generated inputs almost
    // always contain SOME entity, so discarding would exhaust the run
    check(Prop.forAll(genHtmlish) { s =>
      val once = Text.extractText(s.getBytes(UTF_8))
      once.exists(c => c == '<' || c == '&') ||
        Text.extractText(once.getBytes(UTF_8)) == once
    })
  }

  test("extractText is idempotent on every synthesized corpus page") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().toSeq
    graft.oracle.RefOracle.pagesFor(docs).foreach { p =>
      val once = Text.extractText(p.html)
      assert(Text.extractText(once.getBytes(UTF_8)) == once, s"url=${p.url}")
    }
  }

  test("property: normalizeMention is idempotent") {
    check(Prop.forAll(Gen.asciiPrintableStr.map(_.take(20))) { s =>
      val once = Text.normalizeMention(s)
      Text.normalizeMention(once) == once
    })
  }

  // ---- connected components invariants (Spark path — fewer cases) ----

  test("property: CC assignment invariant under edge shuffle/dup/flip; valid fixpoint") {
    val genEdges = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es
    check(Prop.forAll(genEdges) { es =>
      val base = ConnectedComponents.run(es.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      // permuted + duplicated + flipped orientation must not change it
      val mangled = new scala.util.Random(7)
        .shuffle(es.map(e => (e._2, e._1)) ++ es)
      val again = ConnectedComponents.run(mangled.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      // fixpoint validity: both endpoints of every non-self edge agree,
      // and every component label is the min id in the component
      val endpointsAgree = es.forall { case (a, b) =>
        a == b || base(a) == base(b)
      }
      val minLabel = base.groupBy(_._2).forall { case (comp, members) =>
        members.keys.min == comp
      }
      base == again && endpointsAgree && minLabel
    }, cases = 15)
  }

  // ---- band-join rewrite: the two-bucket coverage obligation ----

  test("property: every in-band (lt, rt) pair lands in a probed bucket {b(lt), b(lt)-1}") {
    // the rewrite's completeness rests on: rt ∈ [lt - W, lt] ⇒
    // bucket(rt) ∈ {bucket(lt), bucket(lt)-1} under TRUNCATING division
    // (GraftBandBucket). Adversarial micros: any sign, near 0, near ±W
    // multiples, far range — the exact corners where trunc ≠ floor.
    val genMicros = Gen.oneOf(
      Gen.choose(-5000L, 5000L),
      Gen.choose(-3L, 3L).map(_ * 86400000000L),
      Gen.choose(Long.MinValue / 4, Long.MaxValue / 4))
    val gen = for {
      lt <- genMicros
      w <- Gen.oneOf(Gen.choose(1L, 100L), Gen.choose(1L, 7200L).map(_ * 1000000L))
      off <- Gen.choose(0L, w) // rt = lt - off ∈ [lt - w, lt]
    } yield (lt, lt - off, w)
    check(Prop.forAll(gen) { case (lt, rt, w) =>
      val bl = lt / w
      val br = rt / w
      br == bl || br == bl - 1
    }, cases = 2000)
  }

  // ---- Misra-Gries sketch: the n/(k+1) superset guarantee ----

  test("property: MG keeps every item with freq > n/(k+1) under any merge tree") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val gen = for {
      k <- Gen.choose(2, 12)
      n <- Gen.choose(1, 400)
      vocab <- Gen.choose(1, 60)
      words <- Gen.listOfN(n, Gen.choose(0, vocab - 1).map(i => s"w$i"))
      nSplits <- Gen.choose(1, 6)
      splits <- Gen.listOfN(n, Gen.choose(0, nSplits - 1))
      seed <- Gen.choose(0L, 1000000L)
    } yield (k, words, splits, seed)
    check(Prop.forAll(gen) { case (k, words, splits, seed) =>
      val agg = graft.functions.FreqItemsSketch(
        BoundReference(0, StringType, nullable = true), k)
      // partition the stream, update per-partition buffers
      val bufs = words.zip(splits).groupBy(_._2).values.map { part =>
        part.map(_._1).foldLeft(agg.createAggregationBuffer()) { (b, w) =>
          agg.update(b, InternalRow(UTF8String.fromString(w)))
        }
      }.toVector
      // random-order merge tree, with a serialize/deserialize round
      // trip on each buffer first (the shuffle path)
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(bufs).map(b => agg.deserialize(agg.serialize(b)))
      val merged = shuffled.reduce(agg.merge)
      val out = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.map(_.toString).toSet
      val exact = words.groupBy(identity).view.mapValues(_.size)
      val guaranteed = exact.filter(_._2 * (k + 1) > words.size).keys.toSet
      out.size <= k && guaranteed.subsetOf(out)
    }, cases = 300)
  }
}
