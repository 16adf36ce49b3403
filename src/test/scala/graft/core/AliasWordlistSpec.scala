package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Pins the SURVEY §7.4 alias deviation (FIXTURES §8): email/name/address
  * aliases use the repo's embedded word lists instead of Faker ja_JP
  * locale data. Both the LISTS and sample alias OUTPUTS are frozen in
  * golden/alias_wordlists.json — any drift (a reordered vector changes
  * every downstream alias, because PyRandom.choice indexes by position)
  * fails here and forces a deliberate fixture regeneration
  * (Test/runMain graft.AliasWordlistGen) in the same change. */
class AliasWordlistSpec extends AnyFunSuite {

  private lazy val root = {
    val in = getClass.getResourceAsStream("/golden/alias_wordlists.json")
    val r = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    in.close()
    r
  }

  test("embedded word lists are byte-identical to the pinned fixture") {
    val pinned = root.get("word_lists")
    val lists = RefAlias.wordLists
    assert(pinned.fieldNames.asScala.toSet == lists.keySet,
      "word-list key set drifted")
    lists.foreach { case (k, vs) =>
      val want = (0 until pinned.get(k).size).map(pinned.get(k).get(_).asText)
      assert(vs == want, s"word list '$k' drifted from the pinned fixture " +
        "— if deliberate, regenerate via Test/runMain graft.AliasWordlistGen")
    }
  }

  test("alias vectors replay byte-identically under the pinned key/ns") {
    val key = root.get("key_b64").asText
    val ns = root.get("ns").asText
    val vecs = root.get("vectors")
    assert(vecs.size >= 9)
    (0 until vecs.size).foreach { i =>
      val v = vecs.get(i)
      val got = RefAlias.alias(v.get("kind").asText, v.get("orig").asText,
        key, ns)
      assert(got == v.get("alias").asText,
        s"alias drifted for (${v.get("kind").asText}, ${v.get("orig").asText})")
    }
  }
}
