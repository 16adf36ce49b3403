package graft.spark

import graft.core.AhoCorasick
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Toxicity filtering + scrubbing — the second scrub family the
  * north-rule names next to PII ("PII/toxicity-scrub"). The reference
  * service is PII-only; the semantics here are the public C4/Dolma
  * recipe: a word blocklist applied at word boundaries, with (a) per-doc
  * hit counts feeding a keep/drop rule (C4 drops on ANY hit; milder
  * pipelines threshold on the hit ratio) and (b) a scrub mode masking
  * the terms in place (the toxicity twin of the PII alias scrub).
  *
  * Two tiers, same semantics (equivalence is test-pinned):
  *  - the REGEX tier builds one case-insensitive word-boundary union
  *    pattern — native `regexp_count`/`regexp_replace` expressions that
  *    stay in whole-stage codegen AND have exact DuckDB equivalents, so
  *    the driver oracle reproduces counts and scrubbed text verbatim.
  *    Right for curated lists up to a few hundred terms.
  *  - the AUTOMATON tier compiles the list into an Aho-Corasick matcher
  *    with explicit word-boundary + lowercase checks — O(|text|) per doc
  *    regardless of list size, the shape that survives UT1/LDNOOBW-scale
  *    lists (hundreds of thousands of terms, where a regex union dies).
  *
  * The DEFAULT list is a deliberately small English placeholder — a
  * production run swaps in per-language curated lists (broadcast, like
  * every other model artifact here); the learned upgrade path is the
  * [[QualityTrain]]/[[NerTagTrain]] recipe with list-labeled distant
  * supervision. */
object Toxicity {

  /** Small English placeholder blocklist (C4-style). Production lists are
    * per-language and pluggable; nothing below is load-bearing. */
  val DefaultList: Seq[String] = Seq(
    "damn", "hell", "crap", "shit", "fuck", "bastard", "bitch",
    "asshole", "piss", "slut", "whore", "dick")

  /** One case-insensitive word-boundary union over the list — identical
    * syntax and semantics in Java regex and DuckDB's RE2 for ASCII
    * words. */
  def pattern(words: Seq[String] = DefaultList): String = {
    require(words.nonEmpty && words.forall(_.matches("[A-Za-z]+")),
      "blocklist terms must be plain ASCII words (the boundary semantics " +
        "both engines share); use the automaton tier for anything else")
    "(?i)\\b(?:" + words.mkString("|") + ")\\b"
  }

  /** Per-doc toxic-term count (native expression). */
  def count(text: Column, words: Seq[String] = DefaultList): Column =
    size(regexp_extract_all(text, lit(pattern(words)), lit(0))).cast("long")

  /** Toxicity scrub: mask every listed term in place. */
  def scrub(text: Column, words: Seq[String] = DefaultList,
            mask: String = "<TOXIC>"): Column =
    regexp_replace(text, pattern(words), mask)

  /** C4 keep/drop: `maxHits = 0` drops on any hit (C4's rule); raise it
    * for threshold-style pipelines. */
  def dropFlag(nToxic: Column, maxHits: Long = 0L): Column =
    nToxic > lit(maxHits)

  // ---- automaton tier (list-size-independent scan) -------------------------

  /** Compiled blocklist: lowercase Aho-Corasick + word-boundary check. */
  final case class Matcher(words: Seq[String]) extends Serializable {
    @transient private lazy val lowered = words.map(_.toLowerCase(java.util.Locale.ROOT)).toArray
    @transient private lazy val ac = new AhoCorasick(lowered)
    private def isWord(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'

    /** Count of word-boundary-delimited occurrences (case-insensitive). */
    def countIn(t: String): Long = {
      if (t == null) return 0L
      val lower = t.toLowerCase(java.util.Locale.ROOT)
      var n = 0L
      ac.findAll(lower).foreach { case (pi, end) =>
        val start = end - lowered(pi).length
        if ((start == 0 || !isWord(lower.charAt(start - 1))) &&
            (end == lower.length || !isWord(lower.charAt(end))))
          n += 1
      }
      n
    }
  }

  /** Automaton-tier count UDF (broadcast matcher — the 100-TB shape for
    * LDNOOBW-scale lists). */
  def countUdf(m: Broadcast[Matcher]) =
    udf { (t: String) => m.value.countIn(t) }
}
