package graft.core

/** Gopher-style n-gram repetition metrics (Rae et al. 2021, §A1.1) — the
  * rule family the single-scan [[Quality.metrics]] dup-line/dup-word stats
  * do not cover: repeated PHRASES inside a document.
  *
  * Over lowercase whitespace tokens ([[Quality.tokens]] semantics):
  *  - `topNgramCharFracMilli(n)`: fraction of token characters contained
  *    in occurrences of the single most frequent n-gram (count desc, then
  *    lexicographically smallest joined gram — deterministic ties); 0 when
  *    no n-gram repeats. Gopher applies this for n = 2..4.
  *  - `dupNgramCharFracMilli(n)`: fraction of token characters covered by
  *    ANY n-gram occurring ≥ 2 times (overlapping coverage counted once).
  *    Gopher applies this for n = 5..10.
  *
  * All counts are integers and the only float step is one
  * `floor(1000.0 · covered / total)` — milli results are exact and the
  * CPython twin reproduces them bit-for-bit. Character totals are the sum
  * of token lengths (separators excluded) on both sides.
  */
object GopherRepetition {

  private def gramKey(toks: Array[String], i: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(i + j))
      j += 1
    }
    sb.toString
  }

  private def totalChars(toks: Array[String]): Long = {
    var t = 0L
    var i = 0
    while (i < toks.length) { t += toks(i).length; i += 1 }
    t
  }

  def topNgramCharFracMilli(toks: Array[String], n: Int): Long = {
    val total = totalChars(toks)
    if (total == 0L || toks.length < n) return 0L
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i + n <= toks.length) {
      val k = gramKey(toks, i, n)
      counts.update(k, counts.getOrElse(k, 0L) + 1L)
      i += 1
    }
    // most frequent, ties to the lexicographically smallest gram
    var bestKey: String = null
    var bestCount = 0L
    counts.foreach { case (k, c) =>
      if (c > bestCount || (c == bestCount && (bestKey == null || k < bestKey))) {
        bestKey = k; bestCount = c
      }
    }
    if (bestCount < 2L) return 0L
    val gramChars = bestKey.length.toLong - (n - 1) // joined minus separators
    math.floor(1000.0 * (bestCount * gramChars) / total).toLong
  }

  def dupNgramCharFracMilli(toks: Array[String], n: Int): Long = {
    val total = totalChars(toks)
    if (total == 0L || toks.length < n) return 0L
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i + n <= toks.length) {
      val k = gramKey(toks, i, n)
      counts.update(k, counts.getOrElse(k, 0L) + 1L)
      i += 1
    }
    val covered = new Array[Boolean](toks.length)
    i = 0
    while (i + n <= toks.length) {
      if (counts(gramKey(toks, i, n)) >= 2L) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var marked = 0L
    i = 0
    while (i < toks.length) {
      if (covered(i)) marked += toks(i).length
      i += 1
    }
    math.floor(1000.0 * marked / total).toLong
  }
}
