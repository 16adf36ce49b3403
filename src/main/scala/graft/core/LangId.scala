package graft.core

/** fastText-style character-n-gram language identification.
  *
  * Not in the reference service (it is langid-free); mandated by the
  * north-star pipeline: "fastText-style character-n-gram language ID". This
  * is a from-scratch multinomial model over character 1–3-grams with add-one
  * smoothing, trained at first use from a small embedded seed corpus — the
  * same shape as a fastText supervised model (bag of char n-grams → linear
  * scores) minus the learned embeddings, which keeps it dependency-free and
  * deterministic.
  *
  * The trained model is an immutable, java-serializable value: broadcast it
  * once per job and share across executors (the Spark layer does this),
  * mirroring the reference's `lru_cache` model pattern (app/detectors.py:64).
  */
final case class LangIdModel(
    langs: Vector[String],
    // sorted packed-gram keys (16 bits/char, length tag in bits 48+) with
    // per-lang log-prob rows laid out flat — binary-searched, zero boxing,
    // trivially java-serializable for broadcast
    gramKeys: Array[Long],
    gramLogProbs: Array[Double], // gramKeys.length × langs.length, row-major
    defaultLogProb: Array[Double]
) extends Serializable {

  // open-address index over gramKeys, rebuilt lazily per JVM after broadcast
  // deserialization (1 probe vs ~15 binary-search steps per gram lookup)
  @transient private lazy val (idxTable, idxMask) = {
    var cap = Integer.highestOneBit(gramKeys.length * 4 - 1) << 1
    if (cap < 16) cap = 16
    val table = Array.fill(cap)(-1)
    val mask = cap - 1
    var r = 0
    while (r < gramKeys.length) {
      var i = (mixHash(gramKeys(r)) & mask).toInt
      while (table(i) >= 0) i = (i + 1) & mask
      table(i) = r
      r += 1
    }
    (table, mask)
  }

  private def mixHash(x0: Long): Long = {
    var x = x0 * 0xbf58476d1ce4e5b9L
    x ^= x >>> 32
    x
  }

  private def lookup(key: Long): Int = {
    var i = (mixHash(key) & idxMask).toInt
    while (true) {
      val r = idxTable(i)
      if (r < 0) return -1
      if (gramKeys(r) == key) return r
      i = (i + 1) & idxMask
    }
    -1
  }

  /** (bestLang, confidence in [0,1]) — confidence is the softmax weight of
    * the winning language over the candidate set. Allocation-free per call:
    * the normalized prefix lives in a per-thread reused buffer and only the
    * score array (|langs| doubles) is allocated. */
  def classify(text: CharSequence): (String, Double) = {
    val nl = langs.length
    val scores = new Array[Double](nl)
    val t = LangId.normalize(text)
    var n = 0
    var pos = 0
    while (pos < t.length) {
      var len = 1
      while (len <= 3 && pos + len <= t.length) {
        var key = len.toLong << 48
        var j = 0
        while (j < len) { key |= t.charAt(pos + j).toLong << (j * 16); j += 1 }
        val idx = lookup(key)
        if (idx >= 0) {
          val off = idx * nl
          var i = 0
          while (i < nl) { scores(i) += gramLogProbs(off + i); i += 1 }
        } else {
          var i = 0
          while (i < nl) { scores(i) += defaultLogProb(i); i += 1 }
        }
        n += 1
        len += 1
      }
      pos += 1
    }
    if (n == 0) return ("und", 0.0)
    // softmax over mean log-probs (length-normalized so confidence is
    // comparable across document lengths)
    var best = 0
    var i = 1
    while (i < nl) { if (scores(i) > scores(best)) best = i; i += 1 }
    val mx = scores(best) / n
    var z = 0.0
    i = 0
    while (i < nl) { z += math.exp(scores(i) / n - mx); i += 1 }
    (langs(best), 1.0 / z)
  }
}

object LangId {

  /** Char 1/2/3-grams over a normalized view (lowercase, whitespace folded).
    * String-keyed variant used at TRAIN time only; classification walks the
    * packed-Long keys directly. */
  def grams(text: String): Iterator[String] = {
    val t = normalize(text).toString
    if (t.isEmpty) Iterator.empty
    else (1 to 3).iterator.flatMap(k => t.sliding(k).filter(_.length == k))
  }

  private[graft] def packed(g: String): Long = {
    var key = g.length.toLong << 48
    var j = 0
    while (j < g.length) { key |= g.charAt(j).toLong << (j * 16); j += 1 }
    key
  }

  // per-thread normalize scratch: the buffer is bounded (4096-char prefix
  // + 2 sentinels), so reuse kills the per-row StringBuilder + String pair
  private val normScratch = ThreadLocal.withInitial[(Array[Char], CharsView)](
    () => (new Array[Char](4098), new CharsView))

  private[core] def normalize(text: CharSequence): CharSequence = {
    val (buf, view) = normScratch.get()
    var n = 0
    buf(n) = ' '; n += 1
    var i = 0
    var lastSpace = true
    val lim = math.min(text.length, 4096) // langid needs a prefix, not the doc
    while (i < lim) {
      val c = Character.toLowerCase(text.charAt(i))
      val ws = Character.isWhitespace(c)
      if (!ws) { buf(n) = c; n += 1; lastSpace = false }
      else if (!lastSpace) { buf(n) = ' '; n += 1; lastSpace = true }
      i += 1
    }
    buf(n) = ' '; n += 1
    view.set(buf, n)
  }

  /** Embedded seed corpus (own prose, a few hundred chars per language). */
  private val seedCorpus: Vector[(String, String)] = Vector(
    "en" -> ("the quick brown fox jumps over the lazy dog and the small table " +
      "holds a fresh cup of water while children read their books in the quiet " +
      "room this is a simple english sentence with common words that appear in " +
      "everyday writing such as house street morning work people time year way " +
      "day thing world life hand part place week case point group number fact"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso y la mesa " +
      "pequena tiene una taza de agua fresca mientras los ninos leen sus libros " +
      "en la habitacion tranquila esta es una frase sencilla en espanol con " +
      "palabras comunes que aparecen cada dia como casa calle manana trabajo " +
      "gente tiempo ano camino dia cosa mundo vida mano parte lugar semana caso"),
    "de" -> ("der schnelle braune fuchs springt uber den faulen hund und der " +
      "kleine tisch tragt eine frische tasse wasser wahrend die kinder ihre " +
      "bucher im ruhigen zimmer lesen dies ist ein einfacher deutscher satz mit " +
      "haufigen wortern wie haus strasse morgen arbeit leute zeit jahr weg tag " +
      "ding welt leben hand teil ort woche fall punkt gruppe zahl sache frage"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et la " +
      "petite table porte une tasse d eau fraiche pendant que les enfants " +
      "lisent leurs livres dans la piece calme ceci est une phrase simple en " +
      "francais avec des mots courants comme maison rue matin travail gens " +
      "temps annee chemin jour chose monde vie main partie lieu semaine cas"),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro e il piccolo " +
      "tavolo porta una tazza di acqua fresca mentre i bambini leggono i loro " +
      "libri nella stanza tranquilla questa e una frase semplice in italiano " +
      "con parole comuni come casa strada mattina lavoro gente tempo anno via " +
      "giorno cosa mondo vita mano parte luogo settimana caso punto gruppo"),
    "pt" -> ("a rapida raposa marrom pula sobre o cachorro preguicoso e a " +
      "pequena mesa carrega uma xicara de agua fresca enquanto as criancas " +
      "leem seus livros no quarto tranquilo esta e uma frase simples em " +
      "portugues com palavras comuns como casa rua manha trabalho pessoas " +
      "tempo ano caminho dia coisa mundo vida mao parte lugar semana caso"),
    "ja" -> ("速い茶色の狐はのろまな犬を飛び越えます そして小さな机の上には新しい水の" +
      "入った茶碗があります 子供たちは静かな部屋で本を読んでいます これは日本語の" +
      "簡単な文です 家 道 朝 仕事 人々 時間 年 方法 日 こと 世界 生活 手 部分 場所 " +
      "週 場合 点 数 グループ 事実 です ます した から まで など という ことが あります"),
    "zh" -> ("敏捷的棕色狐狸跳过了懒惰的狗 小桌子上放着一杯新鲜的水 孩子们在安静的" +
      "房间里读书 这是一个简单的中文句子 包含常见的词语 例如 房子 街道 早晨 工作 " +
      "人们 时间 年 方法 天 事情 世界 生活 手 部分 地方 星期 情况 点 数字 组 事实 " +
      "的 了 是 在 有 我们 他们 这个 那个 可以 没有 就是 因为 所以 但是 如果")
  )

  /** Runtime model = the committed binary artifact (GenModels regenerates
    * it from [[trainDefault]]); training stays available for rebuilds. */
  lazy val default: LangIdModel =
    ModelIo.readLangId(ModelIo.resource("/graft/langid.bin"))

  private[core] def trainDefault: LangIdModel = train(seedCorpus)

  def train(corpus: Vector[(String, String)]): LangIdModel = {
    val langs = corpus.map(_._1)
    val counts = langs.map(_ => new scala.collection.mutable.HashMap[String, Int]).toArray
    val totals = new Array[Long](langs.length)
    corpus.zipWithIndex.foreach { case ((_, text), i) =>
      grams(text).foreach { g =>
        counts(i).update(g, counts(i).getOrElse(g, 0) + 1)
        totals(i) += 1
      }
    }
    val vocab = counts.iterator.flatMap(_.keysIterator).toSet
    val v = vocab.size + 1
    val sorted = vocab.toArray.map(g => packed(g) -> g).sortBy(_._1)
    val keys = sorted.map(_._1)
    val flat = new Array[Double](keys.length * langs.length)
    sorted.zipWithIndex.foreach { case ((_, g), row) =>
      var i = 0
      while (i < langs.length) {
        flat(row * langs.length + i) =
          math.log((counts(i).getOrElse(g, 0) + 1.0) / (totals(i) + v))
        i += 1
      }
    }
    val dflt = new Array[Double](langs.length)
    var i = 0
    while (i < langs.length) { dflt(i) = math.log(1.0 / (totals(i) + v)); i += 1 }
    LangIdModel(langs, keys, flat, dflt)
  }
}
