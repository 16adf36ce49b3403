package graft.core

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** Property-based pins over the pure core (no Spark): invariants that must
  * hold for EVERY input, exercised over generated text mixing ASCII, CJK
  * blocks and PII-shaped fragments. The initial seed is FIXED so the
  * driver's `sbt -batch test` run explores the identical cases — this is a
  * broad deterministic regression net, not a roll of the dice per run. */
object CorePropsSpec extends Properties("core") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(0xC0FFEE_2026L)).withMinSuccessfulTests(200)

  // ---- generators ---------------------------------------------------------

  private val piiFragments: Gen[String] = Gen.oneOf(
    "a.b+x@ex.co.jp", "03-1234-5678", "+81-3-1234-567", "¥1,234,567",
    "JPY 12,000", "ACC-12345", "USR-9999", "〒123-4567", "1,234",
    "山田太郎さん", "田中 花子様", "東京都新宿区西新宿2-8-1", "やまだたろう氏",
    "タナカハナコ", "１２３-４５６７")

  private val asciiChunk: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.oneOf("-_,.@#<>()[]{}:;\n".toSeq)
    )).map(_.mkString)

  private val cjkChunk: Gen[String] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.choose('一', '龠'), 2 -> Gen.choose('ぁ', 'ゔ'),
      2 -> Gen.choose('ァ', 'ヶ'), 1 -> Gen.const(' ')
    )).map(_.mkString)

  /** BMP-only mixed text (the corpus invariant — FIXTURES.md). */
  private val text: Gen[String] =
    Gen.listOfN(4, Gen.frequency(
      4 -> asciiChunk, 2 -> cjkChunk, 2 -> piiFragments))
      .map(_.mkString(" "))

  // ---- detector / scrub invariants ----------------------------------------

  property("detectAll hits carry exact offsets into the input") =
    forAll(text) { t =>
      Detect.detectAll(t).forall { h =>
        0 <= h.start && h.start < h.end && h.end <= t.length &&
          t.substring(h.start, h.end) == h.text
      }
    }

  property("dedupSpans output is sorted and non-overlapping") =
    forAll(text) { t =>
      val d = Scrub.dedupSpans(Detect.detectAll(t) ++ Detect.detectAll(t))
      d.sliding(2).forall {
        case Seq(a, b) => a.end <= b.start
        case _ => true
      }
    }

  property("dict scrub is idempotent (aliases never re-match)") =
    forAll(text) { t =>
      val once = Scrub.scrubDict(t).scrubbed
      Scrub.scrubDict(once).scrubbed == once
    }

  property("dict scrub removes every detected span's text occurrence set") =
    forAll(text) { t =>
      val hits = Scrub.dedupSpans(Detect.detectAll(t))
      val s = Scrub.scrubDict(t).scrubbed
      // every deduped hit is replaced at ITS span; the alias markers exist
      hits.isEmpty || s != t
    }

  property("ref aliases are deterministic and JPY inputs stay JPY-prefixed") =
    forAll(Gen.oneOf("phone", "amount", "id", "email", "name", "address"),
           piiFragments) { (kind, orig) =>
      val c = ("Z3JhZnQtc3BhcmstcGlpLWRlZmF1bHQta2V5IQ==", "tenant-a")
      val a1 = RefAlias.aliasWithJpyRule(kind, orig, c._1, c._2)
      val a2 = RefAlias.aliasWithJpyRule(kind, orig, c._1, c._2)
      a1 == a2 &&
        (kind != "amount" || !orig.startsWith("JPY") || a1.startsWith("JPY"))
    }

  // ---- dedup math invariants ----------------------------------------------

  property("minhash signature: fixed length, self-similarity 1") =
    forAll(text) { t =>
      val sig = TextDedup.minHash(t, 3, 64)
      sig.length == 64 && TextDedup.sigSimilarity(sig, sig) == 1.0
    }

  property("signature similarity is within [0,1] and symmetric") =
    forAll(text, text) { (a, b) =>
      val (sa, sb) = (TextDedup.minHash(a, 3, 64), TextDedup.minHash(b, 3, 64))
      val s = TextDedup.sigSimilarity(sa, sb)
      s >= 0.0 && s <= 1.0 && s == TextDedup.sigSimilarity(sb, sa)
    }

  property("fingerprint ignores whitespace runs and case") =
    forAll(text) { t =>
      TextDedup.fingerprint(t.replace(" ", "   ")) ==
        TextDedup.fingerprint(t.toUpperCase(java.util.Locale.ROOT).replace(" ", " \t "))
    }

  // ---- quality / repetition invariants ------------------------------------

  property("quality ratios stay in [0,1]") =
    forAll(text) { t =>
      val m = Quality.metrics(t)
      Seq(m.stopwordRatio, m.symbolRatio, m.dupLineFrac, m.dupWordFrac,
        m.alphaWordRatio, m.cjkRatio).forall(r => r >= 0.0 && r <= 1.0)
    }

  property("gopher repetition fractions stay in [0,1000]") =
    forAll(text, Gen.choose(2, 5)) { (t, n) =>
      val toks = Quality.tokens(t)
      val a = GopherRepetition.topNgramCharFracMilli(toks, n)
      val b = GopherRepetition.dupNgramCharFracMilli(toks, n)
      a >= 0L && a <= 1000L && b >= 0L && b <= 1000L
    }

  // ---- NER tagger scanner invariants --------------------------------------

  property("candidate spans are in-bounds, ordered by start, and non-empty") =
    forAll(text) { t =>
      val spans = NerTag.candidateSpans(t)
      spans.forall { case (a, b) => 0 <= a && a < b && b <= t.length } &&
        spans.map(_._1) == spans.map(_._1).sorted
    }

  property("span features are non-empty and reproducible") =
    forAll(text) { t =>
      NerTag.candidateSpans(t).forall { case (a, b) =>
        val s = t.substring(a, b)
        val f = NerTag.features(s)
        f.nonEmpty && f == NerTag.features(s) && f.contains("BIAS")
      }
    }
}
