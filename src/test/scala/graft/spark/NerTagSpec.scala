package graft.spark

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Trained NER span tagger: the sufficient statistic matches the CPython
  * twin bit-for-bit, and the assembled model detects UNSEEN
  * surname-pattern entities the gazetteer cannot, merged into the
  * ENHANCED scrub path. */
class NerTagSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private lazy val model = NerTagTrain.train(
    spark, DataGen.pages(spark, 2000).toDF(), "text")

  test("q_ner_train matches the CPython twin over the pages corpus") {
    val got = SparkEntry.queries("q_ner_train")(spark, "/root/testdata/sf0.01")
    val want = spark.read.parquet(
      "src/test/resources/golden/expected_sf0.01/ner_train.parquet")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("unseen surname-pattern name: tagger detects, gazetteer cannot, " +
      "ENHANCED scrub redacts") {
    // 森本 is not a gazetteer family, so 森本太郎 is no entry and contains
    // none — the dictionary automaton is blind to it
    val text = "担当は森本太郎さんです"
    assert(NerSlot.defaultModel.hitsOf(text).isEmpty)
    val hits = model.hitsOf(text)
    assert(hits.exists(h => h.text == "森本太郎" && h.kind == "name"),
      s"tagger missed the unseen name; hits=$hits")
    // merged into the ENHANCED scrub: the name must be aliased away
    val c = Pipeline.Conf()
    val r = graft.core.Scrub.scrubWithModeNer("dict", text, c.keyB64, c.ns,
      "", NerSlot.defaultModel.hitsOf(text) ++ hits)
    assert(!r.scrubbed.contains("森本太郎"), s"leaked: ${r.scrubbed}")
    assert(r.scrubbed.contains("<PERSON_"), s"no person alias: ${r.scrubbed}")
  }

  test("unseen org-pattern span classifies as org") {
    // 宮森 is not an org stem; the 株式会社 suffix shape generalizes
    assert(model.predict("宮森株式会社").contains("ORG"))
  }

  test("common corpus words stay untagged") {
    assert(model.predict("茶色").isEmpty)   // ja pool word (NEG in training)
    assert(model.predict("Contact").isEmpty) // capitalized English word
  }
}
