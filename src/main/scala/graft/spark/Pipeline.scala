package graft.spark

import graft.core.{LangId, Perplexity, Quality, Scrub}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship pipeline: pages → langid → perplexity → quality rules →
  * PII scrub → keep/drop — one narrow stage from scan to sink.
  *
  * Design (SURVEY.md §3.1, §4): all per-row work is deterministic UDFs over
  * `graft.core`; model state (langid, perplexity) is broadcast once per job;
  * the keep/drop decision is a NATIVE Catalyst `when` chain over the quality
  * struct (mirroring [[Quality.decide]] rule-for-rule — parity is tested), so
  * Catalyst can prune/push it; the only wide operations in a full run are the
  * salted repartition before the partitioned write and the tiny metrics agg.
  */
object Pipeline {

  /** Security level enum, ported from the reference's 4-level surface
    * (security_manager.py:17-22): MAXIMUM = fully offline rule-only
    * processing; ENHANCED = model-assisted path enabled. HIGH and STANDARD
    * exist for config compatibility and COLLAPSE exactly as the reference's
    * deprecated_map does (security_manager.py:475-486): HIGH→MAXIMUM,
    * STANDARD→ENHANCED. The behavioral switch is the reference's
    * `current_level != MAXIMUM → add NER` (main.py:241-245), realized here
    * at plan-construction time: the NER column is in the plan only for an
    * effective ENHANCED level. */
  sealed abstract class SecurityLevel(val name: String)
  object SecurityLevel {
    case object Maximum extends SecurityLevel("maximum")
    case object High extends SecurityLevel("high")
    case object Standard extends SecurityLevel("standard")
    case object Enhanced extends SecurityLevel("enhanced")

    val All: Seq[SecurityLevel] = Seq(Maximum, High, Standard, Enhanced)

    def parse(s: String): SecurityLevel =
      All.find(_.name == s.toLowerCase)
        .getOrElse(sys.error(s"unknown security level: $s"))

    /** The reference's deprecated_map collapse. */
    def collapse(l: SecurityLevel): SecurityLevel = l match {
      case High => Maximum
      case Standard => Enhanced
      case other => other
    }
  }

  final case class Conf(
      keyB64: String = "Z3JhZnQtc3BhcmstcGlpLWRlZmF1bHQta2V5IQ==", // "graft-spark-pii-default-key!"
      ns: String = "tenant-a",
      quality: Quality.Conf = Quality.Conf(),
      /** "dict" = north-star <TYPE_n> per-doc dictionary (full entity set);
        * "ref"  = reference HMAC+MT19937 aliases (byte-identical
        *          phone/amount/id, app/alias.py semantics);
        * "tags" = fixed <KIND> tokens. */
      scrubMode: String = "dict",
      /** Reference per-request `policies` (app/main.py:379): hit kinds to
        * scrub (email/phone/amount/id/name/address). Empty = all. */
      policies: Set[String] = Set.empty,
      /** true (default): the fused per-page stage runs as the native
        * [[graft.spark.expressions.PageStagesExpr]] — no ScalaUDF shim, no
        * encoder round-trip. false: the broadcast-model UDF path (needed
        * when models are loaded from files rather than built from code). */
      nativeStages: Boolean = true,
      /** Security level (see [[SecurityLevel]]): MAXIMUM (default) keeps
        * the plan rule-only; an effective ENHANCED level adds the
        * broadcast-model NER column at plan-construction time — when off,
        * the stage isn't in the plan at all. */
      security: SecurityLevel = SecurityLevel.Maximum,
      numBuckets: Int = 64,
      saltBuckets: Int = 8,
      /** Optional TRAINED span tagger ([[NerTagTrain.train]]) merged into
        * the model-NER slot at an effective ENHANCED level — detects
        * unseen entities the gazetteer cannot. Forces the broadcast-UDF
        * stage path (the native expression carries only the embedded
        * gazetteer artifact); ignored at MAXIMUM, like the gazetteer. */
      trainedNer: Option[graft.core.NerTag.NerTagModel] = None,
      /** Optional toxicity blocklist ([[Toxicity]], C4 semantics): when
        * set, docs whose text hits the list more than `toxicityMaxHits`
        * times drop with reason "toxicity" (evaluated AFTER every
        * reference-derived rule, so their drop_reason attribution is
        * unchanged) and an `n_toxic` column is surfaced. Default off —
        * the reference pipeline is PII-only. */
      toxicity: Option[Seq[String]] = None,
      toxicityMaxHits: Long = 0L,
      /** PER-LANGUAGE blocklists (the C4/UT1 production shape): each doc
        * is screened against the list of its OWN identified language
        * (`lang_id` from this pipeline's langid stage), via one broadcast
        * [[Toxicity.LangBank]]. Key "*" is the fallback for languages
        * without a list (omit it to skip them). Mutually exclusive with
        * `toxicity` (which screens every doc against one list). */
      toxicityByLang: Option[Map[String, Seq[String]]] = None,
      /** Optional TRAINED quality classifier ([[QualityTrain.train]] /
        * [[QualityTrain.trainNg]] weights): when set, every doc gets a
        * scored `model_keep` column and docs the model rejects (but no
        * heuristic rule caught) drop with reason "quality_model" — the
        * CCNet-style learned filter layered over the rule cascade. The
        * 12-weight model scores NATIVELY off the already-computed quality
        * struct + ppl (codegen, no extra text pass); the 28-weight
        * hashed-n-gram model re-tokenizes in a broadcast-weights UDF.
        * Lowest priority (after toxicity), so all reference-derived
        * drop_reason attributions are unchanged. Default off. */
      qualityModel: Option[Array[Double]] = None) {
    /** Effective level after the reference's deprecated_map collapse. */
    def effectiveLevel: SecurityLevel = SecurityLevel.collapse(security)
    /** main.py:241-245: model NER runs iff effective level != MAXIMUM. */
    def modelNer: Boolean = effectiveLevel != SecurityLevel.Maximum
  }

  /** Adds lang_id/lang_conf, ppl, quality struct, scrub results, keep and
    * drop_reason to the input pages frame. Narrow (no shuffle). */
  def run(spark: SparkSession, pages: DataFrame, conf: Conf = Conf()): DataFrame = {
    val qc = conf.quality

    val policiesCsv = conf.policies.toSeq.sorted.mkString(",")
    val useTagger = conf.modelNer && conf.trainedNer.nonEmpty
    val stagesCol: Column =
      if (conf.nativeStages && !useTagger) {
        graft.spark.expressions.GraftExtensions.install(spark)
        call_function("page_stages", col("text"),
          lit(conf.scrubMode), lit(conf.keyB64), lit(conf.ns), lit(policiesCsv),
          lit(conf.modelNer.toString))
      } else {
        val bLang = spark.sparkContext.broadcast(LangId.default)
        val bPpl = spark.sparkContext.broadcast(Perplexity.default)
        val bNer =
          if (conf.modelNer) Some(spark.sparkContext.broadcast(NerSlot.defaultModel))
          else None
        val bTag =
          if (useTagger) conf.trainedNer.map(spark.sparkContext.broadcast(_))
          else None
        PiiFunctions.pageStagesUdf(bLang, bPpl, conf.scrubMode,
          conf.keyB64, conf.ns, policiesCsv, bNer, bTag)(col("text"))
      }

    val withStages = pages
      .withColumn("r", stagesCol)
      .withColumn("lang_guess", struct(col("r.lang_id").as("lang"), col("r.lang_conf").as("conf")))
      .withColumn("ppl", col("r.ppl"))
      .withColumn("q", col("r.q"))
      .withColumn("scrub", struct(col("r.scrubbed").as("scrubbed"),
        col("r.aliases").as("aliases"), col("r.counts").as("counts")))

    // Native when-chain mirror of Quality.decide (first failing rule wins;
    // word-shape + perplexity rules gated off for CJK text — see core docs).
    val q = col("q")
    val latin = q("cjkRatio") <= 0.3
    val dropReason: Column =
      when(q("nChars") < qc.minChars, "too_short")
        .when(q("nChars") > qc.maxChars, "too_long")
        .when(latin && q("nWords") < qc.minWords, "too_few_words")
        .when(q("nWords") > qc.maxWords, "too_many_words")
        .when(latin && q("meanWordLen") < qc.minMeanWordLen, "mean_word_len_low")
        .when(latin && q("meanWordLen") > qc.maxMeanWordLen, "mean_word_len_high")
        .when(latin && q("maxWordLen") > qc.maxWordLen, "max_word_len")
        .when(q("symbolRatio") > qc.maxSymbolRatio, "symbol_ratio")
        .when(latin && q("stopwordRatio") < qc.minStopwordRatio, "stopword_ratio")
        .when(latin && q("alphaWordRatio") < qc.minAlphaWordRatio, "alpha_word_ratio")
        .when(q("dupLineFrac") > qc.maxDupLineFrac, "dup_lines")
        .when(q("dupWordFrac") > qc.maxDupWordFrac, "dup_words")
        .when(latin && col("ppl") > qc.maxPpl, "perplexity")
        .otherwise("")

    // toxicity (our extension — the reference is PII-only): lowest
    // priority, so every reference-derived drop_reason is attributed
    // exactly as before; the count column exists only when enabled
    // The COUNT always takes the broadcast automaton, whatever the list
    // size: its nondeterministic guard keeps the scan at ONE evaluation
    // per row when downstream keep-filters would otherwise clone the
    // expression into FilterExec (the page_stages lesson — a deterministic
    // regex count fed the drop chain and was re-evaluated per reference;
    // measured in CurAb kept_ext). The SCRUB tier-dispatches: the codegen
    // regex replace for curated lists ≤ RegexTierMax (output-only column,
    // never cloned into predicates), the automaton past it (list-size
    // independent — the UT1/LDNOOBW shape). All tiers implement the ONE
    // pinned boundary/fold semantic, so routing never changes results —
    // ToxicitySpec pins the equivalence.
    require(conf.toxicity.isEmpty || conf.toxicityByLang.isEmpty,
      "toxicity and toxicityByLang are mutually exclusive — put the " +
        "global list under key \"*\" of toxicityByLang to combine")
    val toxMatcher: Option[Broadcast[Toxicity.Matcher]] = conf.toxicity.map {
      ws => pages.sparkSession.sparkContext.broadcast(Toxicity.Matcher(ws))
    }
    val toxBank: Option[Broadcast[Toxicity.LangBank]] = conf.toxicityByLang
      .map(m => pages.sparkSession.sparkContext
        .broadcast(Toxicity.LangBank(m)))
    val toxCount: Option[Column] = (toxMatcher, toxBank) match {
      case (Some(b), _) => Some(Toxicity.countUdf(b)(col("text")))
      case (_, Some(b)) =>
        // dispatch on the pipeline's OWN language id, not the claimed lang
        Some(Toxicity.countByLangUdf(b)(col("lang_guess.lang"), col("text")))
      case _ => None
    }
    val (dropReasonFinal, toxCols) = toxCount match {
      case Some(n) =>
        (when(dropReason =!= lit(""), dropReason)
          .when(Toxicity.dropFlag(n, conf.toxicityMaxHits), "toxicity")
          .otherwise(""),
          Seq(n.as("n_toxic")))
      case None => (dropReason, Seq.empty[Column])
    }

    // model-assisted NER (ENHANCED level, main.py:241-245): the hits are
    // computed INSIDE the fused stage (one automaton pass per row), merged
    // into the scrubbed text + n_hits there, and surfaced as a column only
    // when the level enables them — at MAXIMUM the field is pruned away.
    val nerCols =
      if (conf.modelNer) Seq(col("r.model_hits").as("model_hits")) else Seq.empty
    // with toxicity enabled the OUTPUT text carries both maskings — PII
    // aliases from the fused stage, then the blocklist mask on top (the
    // north-rule's "PII/toxicity-scrub"); survivors under a lenient
    // toxicityMaxHits therefore never ship a listed term
    val scrubbedOut = (conf.toxicity, toxMatcher, toxBank) match {
      case (Some(ws), Some(b), _) =>
        if (ws.size > Toxicity.RegexTierMax)
          Toxicity.scrubUdf(b)(col("scrub.scrubbed"))
        else Toxicity.scrub(col("scrub.scrubbed"), ws)
      case (_, _, Some(b)) =>
        Toxicity.scrubByLangUdf(b)(col("lang_guess.lang"), col("scrub.scrubbed"))
      case _ => col("scrub.scrubbed")
    }
    // trained quality model (CCNet-style learned filter; see Conf docs):
    // materialized as a column FIRST so the drop_reason chain and the
    // output share one computation; lowest-priority drop, after toxicity
    val (withQm, dropReasonAll, qmCols) = conf.qualityModel match {
      case Some(w) =>
        val mk =
          if (w.length == QualityTrain.NF)
            QualityTrain.modelKeepColumn(w, col("q"), col("ppl"))
          else {
            require(w.length == QualityTrain.NFNg,
              s"qualityModel must have ${QualityTrain.NF} or " +
                s"${QualityTrain.NFNg} weights, got ${w.length}")
            val bw = pages.sparkSession.sparkContext.broadcast(w)
            // nondeterministic = duplication guard (the page_stages
            // lesson): this re-tokenizes, and the drop chain references it
            val mkUdf = udf { (t: String, ppl: Double) =>
              val text = if (t == null) "" else t
              QualityTrain.predictKeep(bw.value,
                QualityTrain.featurizeNg(text, ppl)._1)
            }.asNondeterministic()
            mkUdf(col("text"), col("ppl"))
          }
        (withStages.withColumn("model_keep", mk),
          when(dropReasonFinal =!= lit(""), dropReasonFinal)
            .when(!col("model_keep"), "quality_model")
            .otherwise(""),
          Seq(col("model_keep")))
      case None => (withStages, dropReasonFinal, Seq.empty[Column])
    }
    withQm
      .withColumn("drop_reason", dropReasonAll)
      .withColumn("keep", col("drop_reason") === lit(""))
      .select(Seq(
        col("url"), col("warc_ts"), col("lang").as("lang_claimed"),
        col("lang_guess.lang").as("lang_id"), col("lang_guess.conf").as("lang_conf"),
        col("ppl"), col("q").as("quality"),
        col("keep"), col("drop_reason"),
        scrubbedOut.as("scrubbed_text"),
        col("scrub.aliases").as("alias_dict"),
        col("scrub.counts").as("n_hits")) ++ nerCols ++ toxCols ++ qmCols: _*)
  }

  /** Training-pipeline order: exact-dedup the crawl BEFORE paying for
    * scoring/scrub. Representative = lexicographically-first url per
    * normalized-text fingerprint. Shape chosen for skew safety: a
    * `groupBy(fp).agg(min(url))` (map-side partial combine, so a viral
    * duplicated page cannot hot-key a reducer) followed by a left-semi join
    * — rather than a window over fp, which would funnel every copy of a hot
    * fingerprint through one task. */
  def runDeduped(spark: SparkSession, pages: DataFrame,
                 conf: Conf = Conf()): DataFrame = {
    val withFp = pages.withColumn("fp", PiiFunctions.fingerprintUdf(col("text")))
    val reps = withFp.groupBy(col("fp")).agg(min(col("url")).as("url"))
    val survivors = withFp
      .join(reps, Seq("fp", "url"), "left_semi")
      .drop("fp")
    run(spark, survivors, conf)
  }

  /** Host of a url (partition/skew key). */
  def hostCol(url: Column): Column = regexp_extract(url, "://([^/]+)", 1)

  /** Deterministic output bucket: hash of host, NOT of url, so one crawl
    * host's pages land together (Iceberg-style layout), with a salt column to
    * split hot hosts across tasks (north_rule skew handling). */
  def withBucket(df: DataFrame, conf: Conf = Conf()): DataFrame =
    df.withColumn("part_bucket", pmod(hash(hostCol(col("url"))), lit(conf.numBuckets)))

  /** Salted repartition then partitioned write: tasks are keyed by
    * (bucket, salt) so a Zipf-hot host spreads over `saltBuckets` tasks while
    * files stay partitioned by bucket only. `numPartitions = 0` defers to
    * `spark.sql.shuffle.partitions` (the cluster-sized default). */
  def salted(df: DataFrame, conf: Conf = Conf(), numPartitions: Int = 0): DataFrame = {
    val keys = Seq(col("part_bucket"), pmod(hash(col("url")), lit(conf.saltBuckets)))
    if (numPartitions > 0) df.repartition(numPartitions, keys: _*)
    else df.repartition(keys: _*)
  }
}
