package graft.core

/** Reference-fidelity alias generation, a port of `alias_value`
  * (reference: app/alias.py:10-19).
  *
  * phone/amount/id are BYTE-IDENTICAL to the reference: those branches draw
  * only from `random.Random(seed)` (the Faker instance is constructed but not
  * consulted), which [[PyRandom]] reproduces exactly — pinned by golden
  * vectors.
  *
  * email/name/address call Faker("ja_JP") in the reference; Faker's locale
  * data is not portable, so those branches keep the exact HMAC→seed→draw
  * STRUCTURE (same seed, same draw order: Faker's stream is `Random(seed)`
  * too, app/alias.py:12) over our own embedded word lists. Decision recorded
  * in SURVEY.md §7.4 — the primary production scrub uses [[AliasDict]]
  * (`<PERSON_1>`-style) anyway; this mode exists for reference-shape fidelity.
  */
object RefAlias {

  private val domains = Vector("example.dev", "example.com", "invalid.test")
  private val idPrefixes = Vector("USR", "ORD", "ACC")

  /** The embedded stand-in locale data, exposed for the pinned-fixture
    * test ONLY (golden/alias_wordlists.json + AliasWordlistSpec): these
    * lists are a DOCUMENTED deviation from the reference's Faker ja_JP
    * data (SURVEY §7.4, FIXTURES §8) and must never drift silently —
    * editing any list requires regenerating the fixture in the same
    * change, which makes the deviation's surface reviewable. */
  def wordLists: Map[String, Vector[String]] = Map(
    "domains" -> domains, "idPrefixes" -> idPrefixes,
    "userWords" -> userWords, "familyNames" -> familyNames,
    "givenNames" -> givenNames, "prefs" -> prefs, "cities" -> cities)

  // Our stand-in locale data for the Faker-backed branches.
  private val userWords = Vector(
    "sato", "suzuki", "takahashi", "tanaka", "ito", "watanabe", "yamamoto",
    "nakamura", "kobayashi", "kato", "yoshida", "yamada", "sasaki", "matsumoto")
  private val familyNames = Vector(
    "佐藤", "鈴木", "高橋", "田中", "伊藤", "渡辺", "山本", "中村", "小林", "加藤")
  private val givenNames = Vector(
    "太郎", "花子", "一郎", "美咲", "健太", "結衣", "大輔", "さくら", "翔太", "陽菜")
  private val prefs = Vector(
    "東京都", "大阪府", "北海道", "京都府", "福岡県", "愛知県", "神奈川県", "広島県")
  private val cities = Vector(
    "中央区", "北区", "港町", "緑市", "川村", "山町", "泉区", "栄町")

  def alias(kind: String, orig: String, keyB64: String, ns: String): String = {
    val s = AliasKey.seed(keyB64, ns, kind, orig)
    val rnd = PyRandom(s)
    kind match {
      case "phone" =>
        s"0${rnd.randint(1, 9)}-${rnd.randint(1000, 9999)}-${rnd.randint(1000, 9999)}"
      case "amount" =>
        f"¥${rnd.randint(1, 9)},${rnd.randint(0, 999)}%03d,${rnd.randint(0, 999)}%03d"
      case "id" =>
        s"${rnd.choice(idPrefixes)}-${rnd.randint(10000, 99999)}"
      case "email" =>
        // reference: f"{fk.user_name()}@{rnd.choice(domains)}" — the f-string
        // evaluates the Faker draw (its own Random(s) stream) BEFORE rnd.choice.
        val fk = PyRandom(s)
        val user = s"${fk.choice(userWords)}${fk.randint(10, 99)}"
        s"$user@${rnd.choice(domains)}"
      case "name" =>
        val fk = PyRandom(s)
        s"${fk.choice(familyNames)} ${fk.choice(givenNames)}"
      case "address" =>
        val fk = PyRandom(s)
        s"${fk.choice(prefs)}${fk.choice(cities)}${fk.randint(1, 9)}-${fk.randint(1, 30)}-${fk.randint(1, 20)}"
      case _ =>
        val fk = PyRandom(s)
        fk.choice(userWords)
    }
  }

  /** `_generate_alias` / the replacer's amount special case
    * (app/main.py:126-129,134-140): amounts whose ORIGINAL text contains
    * "JPY" are re-prefixed `JPY <digits>`. */
  def aliasWithJpyRule(kind: String, orig: String, keyB64: String, ns: String): String = {
    if (kind == "amount") {
      val a = alias("amount", orig, keyB64, ns)
      if (orig.contains("JPY")) "JPY " + a.dropWhile(_ == '¥').trim else a
    } else alias(kind, orig, keyB64, ns)
  }
}
