package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  test("corpus line dedup keeps first occurrence only, short lines exempt") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique first line here\nshared boilerplate footer line\nok"),
      (2L, "another unique opening\nshared boilerplate footer line\nok"),
      (3L, "shared boilerplate footer line\nthird doc body text here"),
      (4L, "shared boilerplate footer line"))
      .toDF("doc_id", "text")
    val out = WebOps.dedupLinesAcrossCorpus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // footer survives only in doc 1 (first occurrence by (doc_id, line_no))
    assert(out(1L) == "unique first line here\nshared boilerplate footer line\nok")
    assert(out(2L) == "another unique opening\nok") // footer dropped, "ok" (<10) kept
    assert(out(3L) == "third doc body text here")
    // lines drop, documents never do: all-duplicate doc survives empty
    assert(out.contains(4L) && out(4L) == "")
  }

  test("line dedup is deterministic under repartitioning") {
    import spark.implicits._
    val docs = (0L until 500L)
      .map(i => (i, s"body line for doc $i\ncommon repeated footer text\nx"))
      .toDF("doc_id", "text")
    val a = WebOps.dedupLinesAcrossCorpus(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = WebOps.dedupLinesAcrossCorpus(docs.repartition(13), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // footer only in doc 0
    assert(a.count(_._2.contains("common repeated footer")) == 1)
    assert(a.find(_._1 == 0L).get._2.contains("common repeated footer"))
  }

  test("blocklist matches exact hosts and parent domains, not lookalikes") {
    import spark.implicits._
    val bl = spark.sparkContext.broadcast(Set("bad.example", "ads.ok.example"))
    val urls = Seq(
      "https://bad.example/x",        // exact
      "https://sub.bad.example/x",    // subdomain of listed parent
      "https://deep.sub.bad.example/x",
      "https://BAD.example/x",        // case must not bypass
      "https://bad.example:443/x",    // explicit port must not bypass
      "https://user@bad.example/x",   // userinfo must not bypass
      "https://ads.ok.example/x",     // exact leaf entry
      "https://ok.example/x",         // parent of a listed leaf — NOT blocked
      "https://notbad.example/x",     // lookalike suffix string — NOT blocked
      "https://good.example/x"
    ).map(Tuple1(_)).toDF("url")
    val kept = WebOps.filterBlocked(urls, "url", bl)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("https://ok.example/x", "https://notbad.example/x",
      "https://good.example/x"))
  }

  test("intra-doc line dedup: first occurrence kept, short lines exempt, null safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "repeated body line here\nok\nrepeated body line here\nok\ntail text line"),
      (2L, ""),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = WebOps.dedupLinesWithinDoc(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // long line deduped within the doc; short "ok" kept both times
    assert(out(1L) == "repeated body line here\nok\nok\ntail text line")
    assert(out(2L) == "")
    assert(out(3L) == null)
    // intra-doc only: the same long line in ANOTHER doc is untouched
    val two = Seq((1L, "same long line of text"), (2L, "same long line of text"))
      .toDF("doc_id", "text")
    assert(WebOps.dedupLinesWithinDoc(two, "text").where(col("text") =!= "").count() == 2)
  }

  test("stratified sample: per-stratum rates, default keep-all, deterministic") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i =>
      (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "es" else "ja"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 500, "es" -> 0)
    val out = WebOps.stratifiedSample(rows, "lang", "doc_id", rates)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("es", 0L) == 0L)               // rate 0 drops all
    assert(byLang("ja") == 2000L)                          // unlisted: keep-all
    val en = byLang("en")
    assert(en > 350 && en < 650, s"en kept $en of 1000")   // ~50%
    // deterministic: identical sample on rerun and under repartitioning
    val again = WebOps.stratifiedSample(rows.repartition(13), "lang", "doc_id", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("token shards equal the serial prefix-sum definition, any layout") {
    import spark.implicits._
    // adversarial sizes: zero-token docs, a doc bigger than the budget
    val docs = (0L until 500L).map(i =>
      (i, if (i % 7 == 0) 0L else if (i == 100L) 2500L else (i % 40) + 1L))
    val budget = 300L
    var run = 0L
    val expected = docs.map { case (id, n) =>
      val sh = run / budget; run += n; id -> sh
    }.toMap
    // null contract: null id dropped, null count reads as 0 tokens
    val total = docs.map(_._2).sum
    val expectedAll = expected + (600L -> total / budget)
    Seq(3, 17).foreach { parts =>
      val df = docs.toDF("doc_id", "n").repartition(parts)
        .unionByName(spark.sql(
          "SELECT CAST(600 AS BIGINT) doc_id, CAST(NULL AS BIGINT) n"))
        .unionByName(spark.sql(
          "SELECT CAST(NULL AS BIGINT) doc_id, CAST(5 AS BIGINT) n"))
      val got = WebOps.tokenShards(df, "doc_id", "n", budget)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expectedAll, s"layout parts=$parts diverged")
    }
  }

  test("url canonicalization: ports, case, tracking params, fragments") {
    import spark.implicits._
    val cases = Seq(
      "HTTPS://Ex.Example:443/p/1?utm_source=a&x=1#top" ->
        "https://ex.example/p/1?x=1",
      "http://EX.example:80/" -> "http://ex.example",
      "http://ex.example:8080/a/" -> "http://ex.example:8080/a/",
      "https://ex.example/?utm_campaign=z" -> "https://ex.example",
      "https://ex.example/p?a=1&gclid=g&b=2&fbclid=f" ->
        "https://ex.example/p?a=1&b=2",
      "https://ex.example/p/2" -> "https://ex.example/p/2")
    val got = cases.map(_._1).toDF("u")
      .select(WebOps.canonicalUrl(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2),
      got.zip(cases).filter { case (g, (_, w)) => g != w }.mkString("; "))
  }

  test("source reputation blocks low-keep-rate sources") {
    import spark.implicits._
    val docs = Seq(
      ("good.example", true), ("good.example", true), ("good.example", false),
      ("farm.example", false), ("farm.example", false), ("farm.example", true),
      ("empty.example", false))
      .toDF("source", "keep")
    val out = WebOps.sourceReputation(docs, "source", "keep")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out("good.example") == ((666L, false))) // floor(1000*2/3)
    assert(out("farm.example") == ((333L, true)))
    assert(out("empty.example") == ((0L, true)))
  }
}
