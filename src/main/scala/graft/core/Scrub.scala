package graft.core

import java.util.regex.Pattern
import scala.collection.mutable

/** Single-pass union-regex replacement — the core scrub operator.
  *
  * Port of `_inline_replace_line` (reference: app/main.py:100-131): the
  * policy-enabled patterns are joined as `(p1)|(p2)|...` in a FIXED order and
  * applied in ONE left-to-right pass; the replacement kind is dispatched by
  * the first non-null capture group. Single-pass means replaced spans are
  * never re-scanned — essential because reference phone/id aliases are
  * themselves pattern-shaped (app/alias.py:14,16). At equal start offsets the
  * earlier-listed pattern wins; overlaps resolve leftmost-first. All inner
  * groups of the ported patterns are non-capturing, so group i ↔ pattern i.
  *
  * Three alias modes:
  *  - [[Scrub.scrubTags]]   — fixed `<KIND>` tokens (oracle-friendly);
  *  - [[Scrub.scrubDict]]   — north-star `<PERSON_1>`-style numbered aliases
  *                            with a per-document alias dictionary;
  *  - [[Scrub.scrubRef]]    — reference HMAC-seeded aliases ([[RefAlias]]),
  *                            including the JPY reformat branch.
  */
object Scrub {

  /** The reference replacer's order (app/main.py:107-114). */
  val ReferenceOrder: Vector[String] = Vector("email", "phone", "amount", "id")

  /** Extended order for the full pipeline: reference regexes first, then the
    * rule-NER patterns in their evaluation order (our canonical extension for
    * the north-star entity classes: names, postal addresses, ...). */
  val FullOrder: Vector[String] =
    ReferenceOrder ++ Vector("postal", "address", "name_kanji", "name_hiragana", "name_katakana")

  /** Map pattern name → alias kind (postal hits alias as address; the three
    * name patterns alias as name — matching the NER hit types). */
  def kindOf(patternName: String): String =
    Patterns.byName.collectFirst { case (`patternName`, _, k) => k }.get

  /** Compiled union for a pattern-name list. Cached: the set of distinct
    * policy combinations is tiny and executors reuse them across rows. */
  private val unionCache = new java.util.concurrent.ConcurrentHashMap[Seq[String], Pattern]()
  def union(names: Seq[String]): Pattern =
    unionCache.computeIfAbsent(names, ns =>
      Pattern.compile(
        ns.map(n => "(" + Patterns.pattern(n).pattern + ")").mkString("|"),
        Pattern.UNICODE_CHARACTER_CLASS))

  /** Thread-confined Matcher reuse: `Pattern.matcher` allocates per call
    * (matcher + group arrays); at 32 threads × millions of rows that is a
    * measurable slice of allocation bandwidth. `reset(text)` reuses the
    * internal arrays. Matchers are NOT thread-safe — hence per-thread. */
  private val matcherCache =
    ThreadLocal.withInitial[java.util.HashMap[Pattern, java.util.regex.Matcher]](
      () => new java.util.HashMap())
  private[core] def matcherFor(p: Pattern, text: CharSequence): java.util.regex.Matcher = {
    val m = matcherCache.get().computeIfAbsent(p, pp => pp.matcher(""))
    m.reset(text)
    m
  }
  /** Drop the matcher's document reference once scanning finishes — a
    * cached matcher would otherwise pin the last-scanned (possibly
    * MB-sized) text per (thread, pattern) indefinitely. */
  private[core] def release(m: java.util.regex.Matcher): Unit = m.reset("")

  /** Trigger classes per pattern: a pattern cannot match unless the text
    * contains at least one of its trigger characters, so one cheap char scan
    * prunes the expensive union-regex pass (the standard prefilter trick;
    * semantics unchanged — pruned patterns could not have matched). Triggers:
    * email needs '@'; phone/amount/id/postal need a digit; address/name need
    * a CJK/kana codepoint. */
  private val needsAt = Set("email")
  private val needsDigit = Set("phone", "amount", "id", "postal")
  // name/address classes: kana from U+3040, CJK from U+4E00; U+3000-block
  // punctuation (〒 U+3012) also lives here — postal's 〒 prefix is optional
  // so postal stays digit-triggered
  private def isJpTrigger(c: Char): Boolean = c >= '　'

  /** Trigger bitmask of a text: bit0 '@', bit1 digit, bit2 CJK/kana. */
  private def triggerMask(text: CharSequence): Int = {
    var mask = 0
    var i = 0
    val n = text.length
    while (i < n && mask != 7) {
      val c = text.charAt(i)
      if (c == '@') mask |= 1
      else if (Character.isDigit(c)) mask |= 2
      else if (isJpTrigger(c)) mask |= 4
      i += 1
    }
    mask
  }

  private def filterByMask(names: Seq[String], mask: Int): Seq[String] =
    names.filter { n =>
      if (needsAt(n)) (mask & 1) != 0
      else if (needsDigit(n)) (mask & 2) != 0
      else (mask & 4) != 0
    }

  /** Per-(names, mask) prepared scan: the filtered pattern list and its
    * compiled union, built once per combination — the per-ROW work is one
    * cache lookup + array index, no collection allocation (at millions of
    * rows per executor the old per-row `names.filter` was real garbage). */
  private final class Prepared(val names: Seq[String], val pattern: Pattern)
  private val preparedCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Array[Prepared]]()
  private def prepared(names0: Seq[String], mask: Int): Prepared =
    preparedCache.computeIfAbsent(names0, ns =>
      Array.tabulate(8) { m =>
        val f = filterByMask(ns, m)
        new Prepared(f, if (f.isEmpty) null else union(f))
      })(mask)

  /** Drop patterns whose trigger char never occurs. */
  def triggered(text: CharSequence, names: Seq[String]): Seq[String] =
    prepared(names, triggerMask(text)).names

  /** One left-to-right pass; `aliasFor(kind, matchedText)` supplies the
    * replacement. Returns the scrubbed text, or NULL when nothing matched —
    * the raw form lets the fused hot path skip re-encoding an unchanged
    * document (most web rows) instead of copying it through a String. */
  def scrubRaw(text: CharSequence, names0: Seq[String],
               aliasFor: (String, String) => String): String = {
    if (names0.isEmpty || text.length == 0) return null
    val prep = prepared(names0, triggerMask(text))
    val names = prep.names
    if (names.isEmpty) return null
    val m = matcherFor(prep.pattern, text)
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      if (sb == null) sb = new java.lang.StringBuilder(text.length + 16)
      var idx = 1
      while (m.group(idx) == null) idx += 1
      sb.append(text, last, m.start())
      sb.append(aliasFor(kindOf(names(idx - 1)), m.group()))
      last = m.end()
    }
    val out = if (sb == null) null
    else { sb.append(text, last, text.length); sb.toString }
    release(m)
    out
  }

  /** String-total [[scrubRaw]]: unchanged input returns the input itself. */
  def scrub(text: String, names0: Seq[String],
            aliasFor: (String, String) => String): String = {
    val r = scrubRaw(text, names0, aliasFor)
    if (r == null) text else r
  }

  /** Fixed-token mode: every match of kind k becomes `<K>`. */
  def scrubTags(text: String, names: Seq[String] = ReferenceOrder): String =
    scrub(text, names, (k, _) => "<" + k.toUpperCase + ">")

  private val dictTag = Map(
    "email" -> "EMAIL", "phone" -> "PHONE", "amount" -> "AMOUNT",
    "id" -> "ID", "address" -> "ADDRESS", "name" -> "PERSON",
    // model-NER-only kinds (Hf2Pii: ORG→org, MISC→misc)
    "org" -> "ORG", "misc" -> "MISC")

  /** Result of a dictionary scrub: the scrubbed text, the per-document alias
    * dictionary (original → alias, insertion-ordered by first occurrence) and
    * per-kind replacement counts. */
  final case class DictResult(
      scrubbed: String,
      aliases: Map[String, String],
      counts: Map[String, Long])

  /** North-star mode: deterministic per-document numbered aliases
    * (`<PERSON_1>`, `<EMAIL_2>`, ...). The same original string always maps to
    * the same alias within a document; numbering follows first occurrence in
    * the single scan, per tag. Deterministic given (text, names). */
  def scrubDict(text: String, names: Seq[String] = FullOrder): DictResult = {
    // lazy init: most web rows have zero hits — don't pay three map
    // allocations per row for the common no-match case
    var dict: mutable.LinkedHashMap[String, String] = null
    var perTagCounter: mutable.Map[String, Int] = null
    var counts: mutable.Map[String, Long] = null
    val scrubbed = scrub(text, names, { (kind, orig) =>
      if (dict == null) {
        dict = mutable.LinkedHashMap.empty
        perTagCounter = mutable.Map.empty
        counts = mutable.Map.empty
      }
      counts.update(kind, counts.getOrElse(kind, 0L) + 1L)
      val tag = dictTag.getOrElse(kind, "PII")
      dict.getOrElseUpdate(tag + "\u0000" + orig, {
        val n = perTagCounter.getOrElse(tag, 0) + 1
        perTagCounter.update(tag, n)
        s"<${tag}_$n>"
      })
    })
    if (dict == null) DictResult(scrubbed, Map.empty, Map.empty)
    else {
      val aliases = dict.map { case (k, v) => k.substring(k.indexOf('\u0000') + 1) -> v }
      DictResult(scrubbed, aliases.toMap, counts.toMap)
    }
  }

  /** Reference-alias mode over the reference's 4-pattern union, including the
    * JPY branch — byte-identical to the Python service for phone/amount/id. */
  def scrubRef(text: String, keyB64: String, ns: String,
               names: Seq[String] = ReferenceOrder): String =
    scrub(text, names, (k, orig) => RefAlias.aliasWithJpyRule(k, orig, keyB64, ns))

  /** Policy-filtered pattern order, CACHED per (order, csv) — the filter
    * must not run per row in the fused hot path. `policiesCsv` = the
    * reference's per-request `policies` (comma-separated hit kinds,
    * app/main.py:379); empty = all patterns. */
  private val policyCache =
    new java.util.concurrent.ConcurrentHashMap[(Seq[String], String), Seq[String]]()
  def filteredOrder(order: Seq[String], policiesCsv: String): Seq[String] =
    if (policiesCsv.isEmpty) order
    else policyCache.computeIfAbsent((order, policiesCsv), { case (o, csv) =>
      val set = csv.split(',').map(_.trim).filter(_.nonEmpty).toSet
      o.filter(n => set.contains(kindOf(n)))
    })

  /** The per-page scrub-mode dispatch RAW form, shared by the native
    * `page_stages` expression and the broadcast-UDF path (one implementation
    * — the two paths are pinned row-for-row equal by tests and must never
    * drift). `scrubbed == null` means UNCHANGED: the fused hot path then
    * forwards the input UTF8String instead of re-encoding a copy. */
  def scrubWithModeRaw(mode: String, t: CharSequence, keyB64: String, ns: String,
                       policiesCsv: String): DictResult = mode match {
    case "dict" =>
      // lazy init: most web rows have zero hits — don't pay three map
      // allocations per row for the common no-match case
      var dict: mutable.LinkedHashMap[String, String] = null
      var perTagCounter: mutable.Map[String, Int] = null
      var counts: mutable.Map[String, Long] = null
      val scrubbed = scrubRaw(t, filteredOrder(FullOrder, policiesCsv), { (kind, orig) =>
        if (dict == null) {
          dict = mutable.LinkedHashMap.empty
          perTagCounter = mutable.Map.empty
          counts = mutable.Map.empty
        }
        counts.update(kind, counts.getOrElse(kind, 0L) + 1L)
        val tag = dictTag.getOrElse(kind, "PII")
        dict.getOrElseUpdate(tag + "\u0000" + orig, {
          val n = perTagCounter.getOrElse(tag, 0) + 1
          perTagCounter.update(tag, n)
          s"<${tag}_$n>"
        })
      })
      if (dict == null) DictResult(scrubbed, Map.empty, Map.empty)
      else {
        val aliases = dict.map { case (k, v) => k.substring(k.indexOf('\u0000') + 1) -> v }
        DictResult(scrubbed, aliases.toMap, counts.toMap)
      }
    case "tags" =>
      val counts = mutable.Map.empty[String, Long]
      val s = scrubRaw(t, filteredOrder(FullOrder, policiesCsv), { (k, _) =>
        counts.update(k, counts.getOrElse(k, 0L) + 1L)
        "<" + k.toUpperCase + ">"
      })
      DictResult(s, Map.empty, counts.toMap)
    case "ref" =>
      val counts = mutable.Map.empty[String, Long]
      val dict = mutable.Map.empty[String, String]
      val s = scrubRaw(t, filteredOrder(ReferenceOrder, policiesCsv), { (k, orig) =>
        counts.update(k, counts.getOrElse(k, 0L) + 1L)
        dict.getOrElseUpdate(orig, RefAlias.aliasWithJpyRule(k, orig, keyB64, ns))
      })
      DictResult(s, dict.toMap, counts.toMap)
    case other => sys.error(s"unknown scrub mode: $other")
  }

  /** String-total [[scrubWithModeRaw]]: unchanged ⇒ scrubbed = the input. */
  def scrubWithMode(mode: String, t: String, keyB64: String, ns: String,
                    policiesCsv: String): DictResult = {
    val d = scrubWithModeRaw(mode, t, keyB64, ns, policiesCsv)
    if (d.scrubbed == null) d.copy(scrubbed = t) else d
  }

  /** The union pass of [[scrub]] as a SPAN view: same matcher, same order
    * resolution, but hits are collected instead of replaced — the input to
    * the ENHANCED merge path. conf/reason carry the rule-detector values
    * only where the merge needs them (kind + offsets + text decide). */
  def unionHits(text: CharSequence, names0: Seq[String]): Vector[Hit] = {
    if (names0.isEmpty || text.length == 0) return Vector.empty
    val prep = prepared(names0, triggerMask(text))
    val names = prep.names
    if (names.isEmpty) return Vector.empty
    val m = matcherFor(prep.pattern, text)
    val out = Vector.newBuilder[Hit]
    while (m.find()) {
      var idx = 1
      while (m.group(idx) == null) idx += 1
      out += Hit(kindOf(names(idx - 1)), m.group(), m.start(), m.end(), 1.0, "regex")
    }
    release(m)
    out.result()
  }

  /** ENHANCED-mode scrub core — the reference's `regex_hits.extend(ai_ner)`
    * before redaction (app/main.py:241-245) applied to text: regex-union
    * spans and model-NER spans are merged with [[dedupSpans]] (regex hits
    * listed FIRST: both sorts are stable, so at an identical (start, length)
    * the rule hit wins) and replaced in one splice. `modelHits` must carry
    * exact offsets into `text`. */
  def scrubMerged(text: CharSequence, names: Seq[String], modelHits: Seq[Hit],
                  aliasFor: (String, String) => String): String = {
    val merged = dedupSpans(unionHits(text, names) ++ modelHits)
    if (merged.isEmpty) return null // RAW contract: null ⇔ unchanged
    val sb = new java.lang.StringBuilder(text.length + 16)
    var last = 0
    merged.foreach { h =>
      sb.append(text, last, h.start)
      sb.append(aliasFor(h.kind, h.text))
      last = h.end
    }
    sb.append(text, last, text.length)
    sb.toString
  }

  /** Hit KINDS enabled by a policies csv, cached like [[filteredOrder]]. */
  private val policyKindsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
  def policyKinds(policiesCsv: String): Set[String] =
    policyKindsCache.computeIfAbsent(policiesCsv,
      csv => csv.split(',').map(_.trim).filter(_.nonEmpty).toSet)

  /** [[scrubWithModeRaw]] with model-NER hits merged in — the ENHANCED
    * security level's scrub (merge_with_ner, app/detectors.py:100-117).
    * RAW contract: `scrubbed == null` ⇔ unchanged (only possible when no
    * model hit survives the policy filter AND the rule union never fires),
    * so the fused hot path can forward the input at ENHANCED too.
    * Model hits pass the same per-request policy filter as the rule
    * patterns (`hit.get("type") in policies`, app/main.py:250). Kinds the
    * reference aliases via Faker (name/address) use [[RefAlias]]'s branches;
    * org/misc take its fallback draw — total for every model kind. */
  def scrubWithModeNerRaw(mode: String, t: CharSequence, keyB64: String, ns: String,
                          policiesCsv: String, modelHits0: Seq[Hit]): DictResult = {
    val modelHits =
      if (policiesCsv.isEmpty) modelHits0
      else { val ks = policyKinds(policiesCsv); modelHits0.filter(h => ks(h.kind)) }
    // no model hits ⇒ the merged pass degenerates to the plain union scan
    // (find() spans are already non-overlapping) — take the rule-only path
    if (modelHits.isEmpty) return scrubWithModeRaw(mode, t, keyB64, ns, policiesCsv)
    val counts = mutable.Map.empty[String, Long]
    mode match {
      case "dict" =>
        val dict = mutable.LinkedHashMap.empty[String, String]
        val perTagCounter = mutable.Map.empty[String, Int]
        val s = scrubMerged(t, filteredOrder(FullOrder, policiesCsv), modelHits,
          { (kind, orig) =>
            counts.update(kind, counts.getOrElse(kind, 0L) + 1L)
            val tag = dictTag.getOrElse(kind, "PII")
            dict.getOrElseUpdate(tag + "\u0000" + orig, {
              val n = perTagCounter.getOrElse(tag, 0) + 1
              perTagCounter.update(tag, n)
              s"<${tag}_$n>"
            })
          })
        val aliases = dict.map { case (k, v) => k.substring(k.indexOf('\u0000') + 1) -> v }
        DictResult(s, aliases.toMap, counts.toMap)
      case "tags" =>
        val s = scrubMerged(t, filteredOrder(FullOrder, policiesCsv), modelHits,
          { (k, _) =>
            counts.update(k, counts.getOrElse(k, 0L) + 1L)
            "<" + k.toUpperCase + ">"
          })
        DictResult(s, Map.empty, counts.toMap)
      case "ref" =>
        val dict = mutable.Map.empty[String, String]
        val s = scrubMerged(t, filteredOrder(ReferenceOrder, policiesCsv), modelHits,
          { (k, orig) =>
            counts.update(k, counts.getOrElse(k, 0L) + 1L)
            dict.getOrElseUpdate(orig, RefAlias.aliasWithJpyRule(k, orig, keyB64, ns))
          })
        DictResult(s, dict.toMap, counts.toMap)
      case other => sys.error(s"unknown scrub mode: $other")
    }
  }

  /** String-total [[scrubWithModeNerRaw]]: unchanged ⇒ scrubbed = input. */
  def scrubWithModeNer(mode: String, t: String, keyB64: String, ns: String,
                       policiesCsv: String, modelHits0: Seq[Hit]): DictResult = {
    val d = scrubWithModeNerRaw(mode, t, keyB64, ns, policiesCsv, modelHits0)
    if (d.scrubbed == null) d.copy(scrubbed = t) else d
  }

  /** Line-scope tag scrub: the reference applies `_inline_replace_line` per
    * OCR line (app/main.py:404-414); the text analog splits on '\n', scrubs
    * each line independently, and rejoins. Differs from whole-text scrub
    * only where a match would span a newline (amount's `\s?` can swallow
    * one) — line scope is the reference-faithful mode. */
  def scrubTagsLines(text: String, names: Seq[String] = ReferenceOrder): String =
    text.split("\n", -1).map(l => scrubTags(l, names)).mkString("\n")

  /** Greedy non-overlapping span dedup — the text analog of the reference's
    * IoU line dedup (app/main.py:143-154, threshold logic collapsed to exact
    * span overlap since offsets are exact here). Sort by (start, -length),
    * keep a hit iff it starts at/after the last kept end. */
  def dedupSpans(hits: Seq[Hit]): Vector[Hit] = {
    val sorted = hits.sortBy(h => (h.start, -(h.end - h.start)))
    val out = Vector.newBuilder[Hit]
    var lastEnd = -1
    sorted.foreach { h =>
      if (h.start >= lastEnd) { out += h; lastEnd = h.end }
    }
    out.result()
  }
}
