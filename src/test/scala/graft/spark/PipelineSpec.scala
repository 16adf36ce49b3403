package graft.spark

import graft.core.{LangId, Perplexity, Quality, Scrub}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val pages = DataGen.pages(spark, 1500, partitions = 8)
  private lazy val result = Pipeline.run(spark, pages.toDF()).cache()

  test("flagship entry returns rows with the contracted schema") {
    val df = graft.SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("url", "warc_ts", "lang_claimed", "lang_id",
      "lang_conf", "ppl", "quality", "keep", "drop_reason", "scrubbed_text",
      "alias_dict", "n_hits"))
    assert(df.count() == 2000)
  }

  test("keep/drop: native when-chain agrees with core Quality.decide row-for-row (F1 = 1.0)") {
    // reference labels: core functions applied directly to the generated text
    val rows = result.select("url", "keep", "drop_reason", "scrubbed_text").collect()
    val byUrl = pages.collect().map(p => p.url -> p).toMap
    val ppl = Perplexity.default
    var agree = 0
    rows.foreach { r =>
      val p = byUrl(r.getString(0))
      val (expKeep, expReason) = Quality.decide(Quality.metrics(p.text), ppl.perplexity(p.text))
      assert(r.getBoolean(1) == expKeep, s"url=${p.url} reason=${r.getString(2)} exp=$expReason")
      assert(r.getString(2) == expReason, s"url=${p.url}")
      agree += 1
    }
    assert(agree == 1500)
  }

  test("scrubbed text through Spark is byte-identical to core Scrub.scrubDict") {
    val rows = result.select("url", "scrubbed_text").collect()
    val byUrl = pages.collect().map(p => p.url -> p.text).toMap
    rows.foreach { r =>
      assert(r.getString(1) == Scrub.scrubDict(byUrl(r.getString(0))).scrubbed,
        s"url=${r.getString(0)}")
    }
  }

  test("drop reasons cover the synthetic corpus failure modes") {
    val reasons = result.groupBy("drop_reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons.getOrElse("", 0L) > 500L, s"kept docs: $reasons")
    // gibberish docs fail whichever gibberish-family rule fires first in the
    // decide order (mean_word_len before symbol_ratio before perplexity)
    val gibberish = Set("mean_word_len_high", "max_word_len", "symbol_ratio", "perplexity")
    assert(reasons.keySet.exists(gibberish), s"no gibberish-family drops in $reasons")
    Seq("dup_lines", "stopword_ratio", "too_short").foreach { want =>
      assert(reasons.contains(want), s"missing drop_reason $want in $reasons")
    }
  }

  test("langid: claimed-lang agreement is high on clean prose docs") {
    val clean = result.where(col("keep"))
    val n = clean.count()
    val agree = clean.where(col("lang_id") === col("lang_claimed")).count()
    // 5% of claimed langs are deliberately wrong + langid noise on short docs
    assert(agree.toDouble / n > 0.80, s"langid agreement $agree/$n")
  }

  test("alias dictionary round-trip: every alias appears in scrubbed text and original value does not") {
    val rows = result.where(size(map_keys(col("alias_dict"))) > 0)
      .select("scrubbed_text", "alias_dict").limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getString(0)
      val dict = r.getMap[String, String](1)
      dict.foreach { case (orig, alias) =>
        assert(scrubbed.contains(alias), s"alias $alias missing")
        assert(!scrubbed.contains(orig), s"original $orig leaked into: ${scrubbed.take(120)}")
      }
    }
  }

  test("reference-alias scrub mode is byte-identical to core Scrub.scrubRef") {
    val conf = Pipeline.Conf(scrubMode = "ref")
    val sample = DataGen.pages(spark, 200, partitions = 4)
    val rows = Pipeline.run(spark, sample.toDF(), conf)
      .select("url", "scrubbed_text").collect()
    val byUrl = sample.collect().map(p => p.url -> p.text).toMap
    rows.foreach { r =>
      val expected = Scrub.scrubRef(byUrl(r.getString(0)), conf.keyB64, conf.ns)
      assert(r.getString(1) == expected, s"url=${r.getString(0)}")
    }
  }

  test("scrub is idempotent in dict mode (aliases never re-match)") {
    val texts = pages.collect().map(_.text).take(300)
    texts.foreach { t =>
      val once = Scrub.scrubDict(t).scrubbed
      assert(Scrub.scrubDict(once).scrubbed == once)
    }
  }

  test("policy set restricts which kinds are scrubbed (both stage paths)") {
    import spark.implicits._
    val df = Seq(
      ("https://a.example/1", new java.sql.Timestamp(0L), Array.emptyByteArray,
        "mail a@b.cc tel 03-1234-5678 id ACC-12345 pay ¥1,234", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    for (native <- Seq(true, false)) {
      val out = Pipeline.run(spark, df, Pipeline.Conf(
        scrubMode = "tags", policies = Set("email", "id"), nativeStages = native))
        .select("scrubbed_text", "n_hits").head()
      val scrubbed = out.getString(0)
      assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<ID>"))
      assert(scrubbed.contains("03-1234-5678") && scrubbed.contains("¥1,234"),
        s"non-policy kinds must survive: $scrubbed")
      val counts = out.getMap[String, Long](1).toMap
      assert(counts.keySet == Set("email", "id"))
    }
  }

  test("security level gates the NER stage at plan-construction time") {
    import spark.implicits._
    import Pipeline.SecurityLevel._
    val df = Seq(
      ("https://a.example/1", new java.sql.Timestamp(0L), Array.emptyByteArray,
        ("the quick brown fox and 山田太郎 of Example Corp sat by the river " * 3), "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    // per-level plan construction: MAXIMUM rule-only; ENHANCED adds NER;
    // HIGH/STANDARD collapse per the reference's deprecated_map
    def cols(l: Pipeline.SecurityLevel) =
      Pipeline.run(spark, df, Pipeline.Conf(security = l)).columns.toSet
    assert(!cols(Maximum).contains("model_hits"))
    assert(!cols(High).contains("model_hits"))       // HIGH → MAXIMUM
    assert(cols(Standard).contains("model_hits"))    // STANDARD → ENHANCED
    assert(cols(Enhanced).contains("model_hits"))
    assert(Pipeline.SecurityLevel.parse("high") == High)
    assert(Pipeline.SecurityLevel.collapse(High) == Maximum)
    assert(Pipeline.SecurityLevel.collapse(Standard) == Enhanced)

    val on = Pipeline.run(spark, df, Pipeline.Conf(security = Enhanced))
    val hits = on.select(explode(col("model_hits")).as("h"))
      .select(col("h.kind"), col("h.reason")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(hits.contains(("name", "model:PER")) && hits.contains(("org", "model:ORG")))
    assert(!on.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("ENHANCED merges model-NER hits into the scrubbed text and n_hits") {
    import spark.implicits._
    import Pipeline.SecurityLevel._
    val df = Seq(
      ("https://a.example/1", new java.sql.Timestamp(0L), Array.emptyByteArray,
        ("the quick brown fox and 山田太郎 of Example Corp sat by the river " * 3), "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    for (native <- Seq(true, false)) {
      def run(l: Pipeline.SecurityLevel) =
        Pipeline.run(spark, df,
          Pipeline.Conf(security = l, nativeStages = native))
          .select("scrubbed_text", "n_hits").head()
      val mx = run(Maximum)
      val enh = run(Enhanced)
      val mxText = mx.getString(0)
      val enhText = enh.getString(0)
      // MAXIMUM: rule-only — the gazetteer ORG survives (the kanji name is
      // also caught by the rule name pattern, so pin the ORG difference)
      assert(mxText.contains("Example Corp"), s"native=$native: $mxText")
      // ENHANCED: gazetteer entities are REDACTED in the output text
      assert(!enhText.contains("Example Corp"), s"native=$native: $enhText")
      assert(enhText.contains("<ORG_"), s"native=$native: $enhText")
      // ...and counted in n_hits
      val mxCounts = mx.getMap[String, Long](1).toMap
      val enhCounts = enh.getMap[String, Long](1).toMap
      assert(!mxCounts.contains("org"))
      assert(enhCounts.getOrElse("org", 0L) >= 3L, s"native=$native: $enhCounts")
      // the two levels differ ONLY on gazetteer-entity spans: restoring the
      // aliases' spans aside, the non-entity text is untouched
      assert(enhText.replaceAll("<ORG_\\d+>", "Example Corp")
        .replaceAll("<PERSON_\\d+>", "山田太郎") ==
        mxText.replaceAll("<PERSON_\\d+>", "山田太郎"),
        s"native=$native:\n  max=$mxText\n  enh=$enhText")
    }
  }

  test("input_hint invariant: text extracted from html is byte-identical per url") {
    val rows = pages.collect()
    rows.foreach { p =>
      assert(graft.core.HtmlText.extract(p.html) == p.text, s"url=${p.url}")
    }
    // and through the Spark path
    import spark.implicits._
    val mism = pages.map(p => graft.core.HtmlText.extract(p.html) == p.text)
      .filter(!_).count()
    assert(mism == 0)
  }

  test("DataGen is deterministic and partitioning-independent") {
    val a = DataGen.pages(spark, 300, partitions = 2).collect().sortBy(_.url)
    val b = DataGen.pages(spark, 300, partitions = 16).collect().sortBy(_.url)
    assert(a.map(_.text).toSeq == b.map(_.text).toSeq)
    assert(a.map(_.url).toSeq == b.map(_.url).toSeq)
  }

  test("pipeline plan stays narrow: no exchange before the sink") {
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in pipeline plan:\n$plan")
  }

  test("runDeduped drops exact duplicates before scoring, keeps first url") {
    import spark.implicits._
    val base = DataGen.pages(spark, 400, partitions = 4).collect()
    // plant exact copies under later urls
    val dups = base.take(50).map(p => p.copy(url = "https://zzz" + p.url.drop(8)))
    val df = (base ++ dups).toSeq.toDF()
    val out = Pipeline.runDeduped(spark, df)
    // the generated corpus itself contains a few natural exact dups
    // (truncated too-short docs collide), so expect distinct fingerprints
    val expected = base.map(p => graft.core.TextDedup.fingerprint(p.text)).distinct.length
    assert(out.count() == expected)
    assert(out.where(col("url").startsWith("https://zzz")).count() == 0)
    // surviving rows score identically to the plain pipeline
    val survivors = out.select("url").collect().map(_.getString(0)).toSet
    val plain = Pipeline.run(spark, base.toSeq.toDF())
      .select("url", "keep", "scrubbed_text").collect()
      .filter(r => survivors(r.getString(0)))
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).sortBy(_._1)
    val deduped = out.select("url", "keep", "scrubbed_text").collect().map(r =>
      (r.getString(0), r.getBoolean(1), r.getString(2))).sortBy(_._1)
    assert(plain.toSeq == deduped.toSeq)
  }

  test("typed Aggregator run stats equal direct aggregation") {
    val stats = Metrics.collect(result)
    assert(stats.docs == 1500)
    assert(stats.kept == result.where(col("keep")).count())
    assert(stats.piiDocs == result.where(size(map_keys(col("n_hits"))) > 0).count())
    val byReason = result.where(!col("keep")).groupBy("drop_reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.droppedByReason == byReason)
    assert(stats.keepRate > 0.3 && stats.keepRate < 1.0)
  }

  test("salted repartition balances Zipf host skew across shuffle partitions") {
    val conf = Pipeline.Conf(numBuckets = 16, saltBuckets = 32)
    val df = Pipeline.withBucket(
      DataGen.pages(spark, 4000, numHosts = 50).toDF(), conf).cache()
    def maxOverAvg(d: org.apache.spark.sql.DataFrame): Double = {
      val sizes = d.groupBy(spark_partition_id()).count().collect().map(_.getLong(1))
      sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
    }
    val unsalted = maxOverAvg(df.repartition(16, col("part_bucket")))
    val salted = maxOverAvg(Pipeline.salted(df, conf, numPartitions = 16))
    assert(unsalted > salted * 1.2,
      f"salting did not help: unsalted max/avg $unsalted%.2f vs salted $salted%.2f")
    // (bucket,salt) keys are hash-assigned to partitions, so residual
    // collision skew remains; the point is the big improvement over unsalted
    assert(salted < 1.7, f"salted spread still skewed: $salted%.2f")
    df.unpersist()
  }

  test("host-domain distribution is skewed (salting has something to fix)") {
    val hosts = pages.toDF()
      .groupBy(Pipeline.hostCol(col("url")).as("host")).count()
      .orderBy(col("count").desc).limit(1).collect()
    assert(hosts(0).getLong(1) > 1500 / 20, s"top host only ${hosts(0).getLong(1)} rows")
  }
}
