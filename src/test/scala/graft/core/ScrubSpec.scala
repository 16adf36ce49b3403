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
