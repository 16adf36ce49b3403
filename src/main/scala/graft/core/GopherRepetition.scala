package graft.core

/** Gopher-style n-gram repetition metrics (Rae et al. 2021, §A1.1) — the
  * rule family the single-scan [[Quality.metrics]] dup-line/dup-word stats
  * do not cover: repeated PHRASES inside a document.
  *
  * Over lowercase whitespace tokens ([[Quality.tokens]] semantics):
  *  - `topNgramCharFracMilli(n)`: fraction of token characters covered by
  *    occurrences of the single most frequent n-gram (count desc, then
  *    lexicographically smallest joined gram — deterministic ties;
  *    overlapping occurrences count each character once, so the result is
  *    bounded by 1000); measured even when the top n-gram occurs only once
  *    (Gopher's definition has no repetition floor). Gopher: n = 2..4.
  *  - `dupNgramCharFracMilli(n)`: fraction of token characters covered by
  *    ANY n-gram occurring ≥ 2 times (overlap counted once). Gopher:
  *    n = 5..10.
  *
  * Character counts are CODE POINTS (matching Python `len`, Spark
  * `length()` and DuckDB `length()` — UTF-16 units would diverge on
  * astral-plane chars), totals are the sum of token lengths (separators
  * excluded), and the only float step is one
  * `floor(1000.0 · covered / total)` — milli results are exact and the
  * CPython twin reproduces them bit-for-bit.
  */
object GopherRepetition {

  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

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
    while (i < toks.length) { t += cpLen(toks(i)); i += 1 }
    t
  }

  private def coveredChars(toks: Array[String], n: Int,
                           covers: Int => Boolean): Long = {
    val covered = new Array[Boolean](toks.length)
    var i = 0
    while (i + n <= toks.length) {
      if (covers(i)) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var marked = 0L
    i = 0
    while (i < toks.length) {
      if (covered(i)) marked += cpLen(toks(i))
      i += 1
    }
    marked
  }

  private def gramCounts(toks: Array[String],
                         n: Int): scala.collection.mutable.HashMap[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i + n <= toks.length) {
      val k = gramKey(toks, i, n)
      counts.update(k, counts.getOrElse(k, 0L) + 1L)
      i += 1
    }
    counts
  }

  def topNgramCharFracMilli(toks: Array[String], n: Int): Long = {
    val total = totalChars(toks)
    if (total == 0L || toks.length < n) return 0L
    val counts = gramCounts(toks, n)
    // most frequent, ties to the lexicographically smallest gram
    var bestKey: String = null
    var bestCount = 0L
    counts.foreach { case (k, c) =>
      if (c > bestCount || (c == bestCount && (bestKey == null || k < bestKey))) {
        bestKey = k; bestCount = c
      }
    }
    // Gopher measures the top n-gram's fraction even when it occurs once
    // (Rae et al. §A1.1) — no ≥2 floor, or short-document thresholds are
    // effectively looser than the paper's
    val key = bestKey
    val marked = coveredChars(toks, n, i => gramKey(toks, i, n) == key)
    math.floor(1000.0 * marked / total).toLong
  }

  def dupNgramCharFracMilli(toks: Array[String], n: Int): Long = {
    val total = totalChars(toks)
    if (total == 0L || toks.length < n) return 0L
    val counts = gramCounts(toks, n)
    val marked = coveredChars(toks, n, i => counts(gramKey(toks, i, n)) >= 2L)
    math.floor(1000.0 * marked / total).toLong
  }
}
