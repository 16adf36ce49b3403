package graft.core

import java.util.regex.Pattern

/** Exact ports of the reference's detector regexes.
  *
  * email/phone/amount/id: the canonical `RE_*` family
  * (reference: app/detectors.py:22-25 — used by both detection and the
  * single-pass replacer, app/main.py:107-119).
  * postal/address/name: the rule-based NER (app/security_manager.py:182-191).
  *
  * Semantics are pinned to what CPython `re` ACTUALLY does with those pattern
  * strings, which differs from the apparent intent in two places:
  *
  *  1. postal's separator class `[ -‐−–—－]` parses as the RANGE U+0020–U+2010
  *     plus {U+2212, U+2013, U+2014, U+FF0D} — so `123X4567` IS a postal match.
  *     Java parses the same literal identically, so it is kept verbatim.
  *
  *  2. address is built by f-string interpolation of `SEP = r'[-．.・ー—－]'`
  *     INCLUDING its brackets (app/security_manager.py:182-186), producing
  *     `[一-龠0-9[-．.・ー—－]\s]{0,40}`. CPython closes the char class at the
  *     first `]`, yielding: one char from (0-9 ∪ U+005B–U+FF0E), then one
  *     mandatory whitespace, then 0-40 literal `]`. (`一-龠` ⊂ U+005B–U+FF0E.)
  *     Java would instead treat `[...]` as a NESTED class (union), silently
  *     changing semantics — so the Python parse is hand-translated below.
  *     Consequence (verified against CPython): `東京都新宿区西新宿2-8-1` does
  *     NOT match; `東京都新宿区西 新宿` matches `東京都新宿区西 `.
  *
  * `UNICODE_CHARACTER_CLASS` pins `\d`/`\s`/`\b` to Python 3 `re` semantics
  * (full-width digits, ideographic space, Unicode word boundaries).
  * Parity is enforced by golden vectors generated from CPython
  * (src/test/resources/golden/ref_vectors.json).
  */
object Patterns {
  private def p(re: String): Pattern =
    Pattern.compile(re, Pattern.UNICODE_CHARACTER_CLASS)

  val Email: Pattern  = p("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""")
  val Phone: Pattern  = p("""(?:0\d{1,4}-\d{1,4}-\d{3,4})|(?:\+81-\d{1,4}-\d{1,4}-\d{3,4})""")
  val Amount: Pattern = p("""(?:¥|JPY)?\s?\d{1,3}(?:,\d{3})+""")
  val Id: Pattern     = p("""\b(?:ACC|USR|ORD)-\d{4,6}\b""")

  val Postal: Pattern = p("""(?:〒\s*)?(?<!\d)\d{3}[ -‐−–—－]?\d{4}(?![-\d])""")
  // Python-actual parse of the interpolated class (see scaladoc item 2):
  val Address: Pattern =
    p("""[一-龠]{1,10}[都道府県][一-龠]{1,15}[市区町村][0-9\x{5b}-\x{ff0e}]\s\]{0,40}""")
  val NameKanji: Pattern    = p("""[一-龠]{2,4}\s*[一-龠]{1,3}(?:さん|様|氏|先生|君|ちゃん)?""")
  val NameHiragana: Pattern = p("""[ぁ-ゔ]{3,8}(?:さん|様|氏|先生|君|ちゃん)?""")
  val NameKatakana: Pattern = p("""[ァ-ヶ]{3,8}(?:さん|様|氏|先生|君|ちゃん)?""")

  /** name → (pattern, hit kind). Order is the reference's evaluation order. */
  val byName: Vector[(String, Pattern, String)] = Vector(
    ("email", Email, "email"),
    ("phone", Phone, "phone"),
    ("amount", Amount, "amount"),
    ("id", Id, "id"),
    ("postal", Postal, "address"),
    ("address", Address, "address"),
    ("name_kanji", NameKanji, "name"),
    ("name_hiragana", NameHiragana, "name"),
    ("name_katakana", NameKatakana, "name")
  )

  def pattern(name: String): Pattern =
    byName.collectFirst { case (`name`, pat, _) => pat }.get
}
