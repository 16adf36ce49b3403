package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for scrub internals not exercised by the CPython vectors:
  * greedy span dedup (op 19 analog), trigger prefilter equivalence,
  * line-scope vs whole-text divergence. */
class ScrubSpec extends AnyFunSuite {

  test("dedupSpans keeps leftmost-longest non-overlapping hits") {
    def h(k: String, s: Int, e: Int) = Hit(k, "x" * (e - s), s, e, 0.9, "t")
    // overlapping: [0,5) vs [3,8) → keep first; [8,10) disjoint kept;
    // same start [12,20) vs [12,15) → longer kept
    val in = Seq(h("a", 3, 8), h("b", 0, 5), h("c", 8, 10), h("d", 12, 15), h("e", 12, 20))
    val out = Scrub.dedupSpans(in)
    assert(out.map(x => (x.kind, x.start, x.end)) ==
      Vector(("b", 0, 5), ("c", 8, 10), ("e", 12, 20)))
  }

  test("dedupSpans: touching spans both survive (end == next start)") {
    def h(s: Int, e: Int) = Hit("k", "", s, e, 0.9, "t")
    assert(Scrub.dedupSpans(Seq(h(0, 4), h(4, 8))).size == 2)
  }

  test("merged NER scrub: span conflicts resolve by (start, -len), rule wins ties") {
    val key = "Z3JhZnQtc3BhcmstcGlpLWRlZmF1bHQta2V5IQ=="
    // regex email at [5,13); model hits: one identical to the email span,
    // one strictly inside it, one in clean text, one overlapping the tail
    val text = "mail a@ex.com and Example Corp"
    def mh(kind: String, t: String, s: Int) =
      Hit(kind, t, s, s + t.length, 0.9, "model:X")
    val hits = Seq(
      mh("org", "a@ex.com", 5),     // same span as the regex email → regex wins
      mh("org", "ex.com", 7),       // inside the email span → dropped
      mh("org", "Example Corp", 18) // clean region → replaced
    )
    val d = Scrub.scrubWithModeNer("dict", text, key, "ns", "", hits)
    assert(d.scrubbed == "mail <EMAIL_1> and <ORG_1>", d.scrubbed)
    assert(d.counts == Map("email" -> 1L, "org" -> 1L), d.counts)
    assert(d.aliases == Map("a@ex.com" -> "<EMAIL_1>", "Example Corp" -> "<ORG_1>"))
  }

  test("merged NER scrub: longer model span beats shorter rule span at same start") {
    val key = "Z3JhZnQtc3BhcmstcGlpLWRlZmF1bHQta2V5IQ=="
    val text = "ref ACC-12345-EXT done"
    // rule id matches ACC-12345 at [4,13); a model hit covers [4,17)
    val hits = Seq(Hit("org", "ACC-12345-EXT", 4, 17, 0.9, "model:ORG"))
    val d = Scrub.scrubWithModeNer("dict", text, key, "ns", "", hits)
    assert(d.scrubbed == "ref <ORG_1> done", d.scrubbed)
    assert(d.counts == Map("org" -> 1L))
  }

  test("merged NER scrub: policies filter model hits by kind") {
    val key = "Z3JhZnQtc3BhcmstcGlpLWRlZmF1bHQta2V5IQ=="
    val text = "mail a@ex.com and Example Corp"
    val hits = Seq(Hit("org", "Example Corp", 18, 30, 0.9, "model:ORG"))
    val d = Scrub.scrubWithModeNer("dict", text, key, "ns", "email", hits)
    assert(d.scrubbed == "mail <EMAIL_1> and Example Corp", d.scrubbed)
    assert(d.counts == Map("email" -> 1L))
    // and the degenerate no-model-hits case equals the rule-only dispatch
    val a = Scrub.scrubWithModeNer("dict", text, key, "ns", "", Nil)
    val b = Scrub.scrubWithMode("dict", text, key, "ns", "")
    assert(a == b)
  }

  test("merged NER scrub in ref mode aliases model kinds via RefAlias branches") {
    val key = "Z3JhZnQtc3BhcmstcGlpLWRlZmF1bHQta2V5IQ=="
    val text = "by 山田太郎 at Example Corp"
    val hits = Seq(
      Hit("name", "山田太郎", 3, 7, 0.9, "model:PER"),
      Hit("org", "Example Corp", 11, 23, 0.9, "model:ORG"))
    val d = Scrub.scrubWithModeNer("ref", text, key, "ns", "", hits)
    // name branch: "family given" from the embedded word lists; org falls
    // back to the misc draw — both deterministic for a fixed (key, ns)
    assert(!d.scrubbed.contains("山田太郎") && !d.scrubbed.contains("Example Corp"),
      d.scrubbed)
    assert(d.counts == Map("name" -> 1L, "org" -> 1L))
    val again = Scrub.scrubWithModeNer("ref", text, key, "ns", "", hits)
    assert(d == again)
  }

  test("trigger prefilter never changes scrub output") {
    // texts chosen to hit each trigger combination incl. none
    val texts = Seq(
      "no pii words only here",
      "digits 123 4567 only", "at a@b.cc only", "kanji 山田太郎 only",
      "mixed a@b.cc 03-1234-5678 山田太郎さん 〒123-4567 ¥1,234 ACC-12345",
      "", "@", "1", "　")
    texts.foreach { t =>
      val full = Scrub.union(Scrub.FullOrder).matcher(t)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (full.find()) {
        var idx = 1
        while (full.group(idx) == null) idx += 1
        sb.append(t, last, full.start())
          .append("<" + Scrub.kindOf(Scrub.FullOrder(idx - 1)).toUpperCase + ">")
        last = full.end()
      }
      sb.append(t.substring(last))
      assert(Scrub.scrubTags(t, Scrub.FullOrder) == sb.toString, s"text=$t")
    }
  }

  test("megabyte documents go through every stage in bounded time") {
    val rnd = new java.util.Random(7)
    val words = Vector("the", "data", "pipeline", "reads", "rows", "03-1234-5678",
      "a@b.cc", "¥1,234", "and", "writes", "them", "back", "quickly")
    val sb = new StringBuilder
    while (sb.length < 1000000) {
      sb.append(words(rnd.nextInt(words.size))).append(' ')
      if (rnd.nextInt(20) == 0) sb.append('\n')
    }
    val big = sb.toString
    val t0 = System.nanoTime()
    val d = Scrub.scrubDict(big)
    val m = Quality.metrics(big)
    val (l, _) = LangId.default.classify(big)
    val p = Perplexity.default.perplexity(big)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 10.0, s"1MB doc took ${sec}s")
    assert(d.counts("phone") > 1000 && d.counts("email") > 1000)
    assert(m.nChars == big.length && l == "en" && p < 100)
    // scrubbed output carries no original PII strings
    assert(!d.scrubbed.contains("03-1234-5678") && !d.scrubbed.contains("a@b.cc"))
  }

  test("RefAlias Faker-slot branches are deterministic and shape-correct") {
    val key = "Z3JhZnQtc3BhcmstcGlpLWRlZmF1bHQta2V5IQ=="
    def a(kind: String, orig: String) = RefAlias.alias(kind, orig, key, "ns")
    // determinism: same inputs → same alias; different orig → (almost surely) different
    assert(a("email", "x@y.zz") == a("email", "x@y.zz"))
    assert(a("email", "x@y.zz") != a("email", "q@y.zz"))
    // shapes mirror app/alias.py formats
    assert(a("email", "x@y.zz").matches("""[a-z]+\d{2}@(example\.dev|example\.com|invalid\.test)"""))
    assert(a("name", "山田太郎").matches("""[一-龠]+ .+"""))
    assert(a("address", "東京都X").matches(""".+[都道府県].+\d+-\d+-\d+"""))
    // phone/amount/id shapes (byte-parity covered by RefParitySpec)
    assert(a("phone", "03-1111-2222").matches("""0\d-\d{4}-\d{4}"""))
    assert(a("amount", "¥1,000").matches("""¥\d,\d{3},\d{3}"""))
    assert(a("id", "ACC-12345").matches("""(USR|ORD|ACC)-\d{5}"""))
  }

  test("line scope differs from whole-text only on newline-spanning matches") {
    // amount's \s? can swallow the newline before the digits
    val t = "pay ¥\n1,234 now"
    assert(Scrub.scrubTags(t) != Scrub.scrubTagsLines(t))
    val clean = "line one a@b.cc\nline two 03-1234-5678"
    assert(Scrub.scrubTags(clean) == Scrub.scrubTagsLines(clean))
  }
}
