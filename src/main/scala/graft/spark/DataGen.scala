package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** One Common-Crawl-style page row (BASELINE.json input_hint schema). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic `pages` generator (FIXTURES.md §1).
  *
  * Every row is a pure function of its id (splitmix64-seeded
  * `java.util.Random`, whose LCG is specified by the JDK), so the table is
  * identical regardless of partitioning, parallelism, or run — the property
  * the resume/scaling tests rely on. Host distribution is Zipf-skewed so the
  * salted-repartition path has real stragglers to defuse. Doc-type mix
  * exercises every drop reason plus planted PII covering all nine detector
  * patterns.
  */
object DataGen {

  val Langs: Vector[(String, Double)] = Vector(
    "en" -> 0.50, "es" -> 0.10, "de" -> 0.10, "fr" -> 0.10, "ja" -> 0.10, "zh" -> 0.10)

  private val sentencePool: Map[String, Vector[String]] = Map(
    "en" -> Vector(
      "The quick brown fox jumps over the lazy dog near the river bank.",
      "Most readers scan the first page of a report and then move on to other work.",
      "Our support team answers questions about orders within one business day.",
      "The library opens at nine in the morning and closes at eight in the evening.",
      "A small group of people walked along the quiet street in the early morning.",
      "Data systems read rows from tables, filter them, and write the results back."),
    "es" -> Vector(
      "El zorro marron salta sobre el perro perezoso cerca de la orilla del rio.",
      "La mayoria de los lectores revisan la primera pagina y luego siguen con su trabajo.",
      "Nuestro equipo de soporte responde preguntas sobre pedidos cada dia.",
      "La biblioteca abre a las nueve de la manana y cierra a las ocho de la tarde."),
    "de" -> Vector(
      "Der braune Fuchs springt uber den faulen Hund am Ufer des Flusses.",
      "Die meisten Leser lesen die erste Seite und wenden sich dann anderer Arbeit zu.",
      "Unser Team beantwortet Fragen zu Bestellungen innerhalb eines Tages.",
      "Die Bibliothek offnet um neun Uhr morgens und schliesst um acht Uhr abends."),
    "fr" -> Vector(
      "Le renard brun saute par dessus le chien paresseux pres de la riviere.",
      "La plupart des lecteurs lisent la premiere page puis passent a autre chose.",
      "Notre equipe repond aux questions sur les commandes chaque jour.",
      "La bibliotheque ouvre a neuf heures du matin et ferme a huit heures du soir."),
    "ja" -> Vector(
      "速い茶色の狐はのろまな犬を飛び越えます そして静かな川の近くを歩きます",
      "多くの読者は最初のページを読んでから他の仕事に移ります",
      "サポートチームは注文に関する質問に毎日答えています",
      "図書館は朝九時に開いて夜八時に閉まります"),
    "zh" -> Vector(
      "敏捷的棕色狐狸跳过了懒惰的狗 然后沿着安静的河边走",
      "大多数读者看完第一页 就去做别的工作了",
      "我们的支持团队每天回答关于订单的问题",
      "图书馆早上九点开门 晚上八点关门"))

  private val piiSnippets: Vector[Long => String] = Vector(
    r => s"Contact taro.yamada+${r % 97}@example.co.jp for details.",
    r => f"Call 03-${1000 + r % 9000}%04d-${1000 + r % 9000}%04d today.",
    r => f"Intl line +81-3-${1000 + r % 9000}%04d-${100 + r % 900}%03d.",
    r => f"Invoice total ¥${1 + r % 9},${r % 1000}%03d,${r % 1000}%03d paid.",
    r => f"Budget JPY ${1 + r % 9},${r % 1000}%03d remains.",
    r => s"Ticket ACC-${10000 + r % 90000} and USR-${1000 + r % 9000} closed.",
    r => f"Ship to 〒${100 + r % 900}%03d-${1000 + r % 9000}%04d Japan.",
    r => s"担当は山田太郎さんと田中 花子様です。",
    r => s"住所は東京都新宿区西 で受付します。")

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic page for a given id. */
  def pageFor(id: Long, numHosts: Int = 1000): Page = {
    val rnd = new java.util.Random(splitmix64(id))
    // Zipf-ish host rank: exp over uniform → rank 0 dominates
    val host = math.min(numHosts - 1,
      math.floor(math.exp(rnd.nextDouble() * math.log(numHosts.toDouble))).toInt - 1)
    val langRoll = rnd.nextDouble()
    var acc = 0.0
    val lang = Langs.collectFirst {
      case (l, w) if { acc += w; langRoll < acc } => l
    }.getOrElse("en")
    val roll = rnd.nextDouble()
    val pool = sentencePool(lang)
    val nSent = 3 + rnd.nextInt(10)
    val body = new StringBuilder
    // distinct per-line filler so clean prose has unique lines (real pages
    // rarely repeat lines verbatim; the dup-lines doc type plants them)
    val fillers = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    val text: String =
      if (roll < 0.70) { // clean prose, ~40% with planted PII
        (0 until nSent).foreach { i =>
          body.append(pool(rnd.nextInt(pool.size)))
            .append(' ').append(fillers(i % fillers.size)).append('\n')
        }
        if (rnd.nextDouble() < 0.4) {
          val n = 1 + rnd.nextInt(3)
          (0 until n).foreach { _ =>
            body.append(piiSnippets(rnd.nextInt(piiSnippets.size))(math.abs(rnd.nextLong()))).append('\n')
          }
        }
        body.toString
      } else if (roll < 0.78) { // gibberish: symbol soup → ppl/symbol drop
        val chars = "#$%&*+=~^|@!?<>{}[]()abcdefgh0123456789"
        (0 until 300 + rnd.nextInt(300)).foreach { i =>
          body.append(chars.charAt(rnd.nextInt(chars.length)))
          if (i % 40 == 39) body.append('\n')
        }
        body.toString
      } else if (roll < 0.85) { // heavy duplicated lines → dup_lines drop
        val line = pool(rnd.nextInt(pool.size))
        (0 until 12).foreach(_ => body.append(line).append('\n'))
        body.append(pool(rnd.nextInt(pool.size))).append('\n')
        body.toString
      } else if (roll < 0.90) { // rare-word salad → stopword_ratio drop
        val rare = Vector("zyx", "qwv", "plk", "mnb", "trd", "gfs", "hjk", "wqe")
        (0 until 80).foreach { _ => body.append(rare(rnd.nextInt(rare.size))).append(' ') }
        body.toString
      } else if (roll < 0.93) { // too short
        pool(rnd.nextInt(pool.size)).take(20)
      } else { // clean multilingual long doc
        (0 until nSent + 6).foreach { i =>
          body.append(pool(rnd.nextInt(pool.size)))
            .append(' ').append(fillers(i % fillers.size)).append('\n')
        }
        body.toString
      }
    // 5% claimed-lang mismatch
    val claimed =
      if (rnd.nextDouble() < 0.05) Langs((rnd.nextInt(Langs.size)))._1 else lang
    // valid HTML: entity-escape so HtmlText.extract round-trips the text
    // column byte-identically (the input_hint invariant)
    val escaped = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    Page(
      url = s"https://host-$host.example/p/$id",
      warc_ts = new Timestamp(1704067200000L + id * 1000L),
      html = ("<html><body>" + escaped + "</body></html>").getBytes("UTF-8"),
      text = text,
      lang = claimed)
  }

  def pages(spark: SparkSession, n: Long, numHosts: Int = 1000,
            partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(id => pageFor(id, numHosts))
  }
}
