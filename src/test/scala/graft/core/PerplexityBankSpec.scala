package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** CCNet-style per-language perplexity: a document should score lower
  * (more natural) under the LM of its own language than under the
  * English default — the reason production pipelines bank one LM per
  * language instead of over-penalizing non-English prose. */
class PerplexityBankSpec extends AnyFunSuite {

  private val samples = Map(
    "es" -> "los lectores abren la primera pagina del informe y siguen con su trabajo cada manana",
    "de" -> "die leser offnen die erste seite des berichts und gehen dann ihrer arbeit nach",
    "fr" -> "les lecteurs ouvrent la premiere page du rapport puis retournent a leur travail")

  test("own-language LM scores lower perplexity than the en default") {
    samples.foreach { case (lang, text) =>
      val own = Perplexity.forLang(lang).perplexity(text)
      val en = Perplexity.default.perplexity(text)
      assert(own < en, s"$lang: own=$own en=$en")
    }
  }

  test("unknown languages fall back to the default model") {
    assert(Perplexity.forLang("xx") eq Perplexity.default)
    val en = "the report shows that most users read the first page and move on"
    assert(Perplexity.forLang("en").perplexity(en) ==
      Perplexity.default.perplexity(en))
  }

  test("trainer regenerates the committed ppl artifacts byte-identically") {
    // guards the fromCounts refactor (trigram-marginalized bigram/unigram
    // must give bit-equal floats to the original three-array trainer)
    val bank = Perplexity.trainBank
    for (lang <- Seq("en", "es", "de", "fr")) {
      val committed = ModelIo.resource(s"/graft/ppl_$lang.lm").readAllBytes()
      val retrained = ModelIo.writePpl(bank(lang))
      assert(java.util.Arrays.equals(committed, retrained), lang)
    }
  }

  test("gibberish scores far above own-language natural text per model") {
    val junk = "#$%&*+=~^|@!?<>{}[]()" * 10
    samples.foreach { case (lang, text) =>
      val m = Perplexity.forLang(lang)
      assert(m.perplexity(junk) > 3 * m.perplexity(text),
        s"$lang: junk=${m.perplexity(junk)} text=${m.perplexity(text)}")
    }
  }
}
