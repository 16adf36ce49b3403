package graft.core

import java.util.regex.Pattern
import scala.collection.immutable.VectorBuilder

/** Pure text→hits detection, a port of the reference's detector semantics.
  *
  * `classifyByRegex` reproduces app/detectors.py:28-34: all email hits first,
  * then phone, amount, id — fixed confidences, fixed reasons.
  * `ruleNer` reproduces app/security_manager.py:177-212 (`ner_process` on one
  * text): postal (kind=address, conf .85), address (.80), then the three name
  * patterns (.75) in order.
  * `detectAll` = classifyByRegex ++ ruleNer, i.e. `merge_with_ner`
  * (app/detectors.py:36-38) with the rule NER as the NER side.
  */
object Detect {

  private def scan(pat: Pattern, text: String, kind: String, conf: Double,
                   reason: String, out: VectorBuilder[Hit]): Unit = {
    val m = Scrub.matcherFor(pat, text) // thread-confined matcher reuse
    while (m.find()) out += Hit(kind, m.group(), m.start(), m.end(), conf, reason)
    Scrub.release(m)
  }

  // one cheap scan prunes whole pattern families (same trigger logic as
  // Scrub.triggered; a pruned pattern could not have matched)
  private def triggers(text: String): (Boolean, Boolean, Boolean) = {
    var hasAt = false
    var hasDigit = false
    var hasJp = false
    var i = 0
    while (i < text.length && !(hasAt && hasDigit && hasJp)) {
      val c = text.charAt(i)
      if (c == '@') hasAt = true
      else if (Character.isDigit(c)) hasDigit = true
      else if (c >= '　') hasJp = true
      i += 1
    }
    (hasAt, hasDigit, hasJp)
  }

  /** app/detectors.py:28-34 — email/phone/amount/id with fixed confs. */
  def classifyByRegex(text: String): Vector[Hit] = {
    val (hasAt, hasDigit, _) = triggers(text)
    if (!hasAt && !hasDigit) return Vector.empty
    val out = new VectorBuilder[Hit]
    if (hasAt) scan(Patterns.Email, text, "email", 0.99, "regex:email", out)
    if (hasDigit) {
      scan(Patterns.Phone, text, "phone", 0.95, "regex:phone", out)
      scan(Patterns.Amount, text, "amount", 0.90, "regex:amount", out)
      scan(Patterns.Id, text, "id", 0.88, "regex:id", out)
    }
    out.result()
  }

  /** app/security_manager.py:177-212 — rule-based postal/address/name NER. */
  def ruleNer(text: String): Vector[Hit] = {
    val (_, hasDigit, hasJp) = triggers(text)
    if (!hasDigit && !hasJp) return Vector.empty
    val out = new VectorBuilder[Hit]
    if (hasDigit) scan(Patterns.Postal, text, "address", 0.85, "offline_rule_postal", out)
    if (hasJp) {
      scan(Patterns.Address, text, "address", 0.80, "offline_rule_address", out)
      scan(Patterns.NameKanji, text, "name", 0.75, "offline_rule_name", out)
      scan(Patterns.NameHiragana, text, "name", 0.75, "offline_rule_name", out)
      scan(Patterns.NameKatakana, text, "name", 0.75, "offline_rule_name", out)
    }
    out.result()
  }

  /** merge_with_ner (app/detectors.py:36-38): regex hits ++ ner hits. */
  def detectAll(text: String): Vector[Hit] =
    classifyByRegex(text) ++ ruleNer(text)

  /** Per-type counts; `includeAmount=false` reproduces the /detect/summary
    * quirk where `amount` is silently excluded (app/main.py:647,672-673). */
  def counts(hits: Seq[Hit], includeAmount: Boolean = true): Map[String, Long] = {
    val filtered = if (includeAmount) hits else hits.filterNot(_.kind == "amount")
    filtered.groupBy(_.kind).map { case (k, v) => k -> v.size.toLong }
  }

  /** app/main.py:725 — any hit at all. */
  def piiFound(hits: Seq[Hit]): Boolean = hits.nonEmpty
}
