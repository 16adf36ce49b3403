package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-rule training over a corpus — the tokenizer-training stage of
  * a data pipeline (the q_bpe_tokens regex is the SEGMENTER twin; this
  * learns the merge table itself).
  *
  * Scale shape, which is how production tokenizer training actually runs
  * (HF tokenizers / sentencepiece): the CORPUS-sized work — tokenize +
  * word-frequency aggregation — is distributed (one explode + hash-agg
  * with map-side combine over any number of documents); the merge loop
  * then runs single-node over the WORD-FREQUENCY DICT, which is vocabulary
  * -sized (≈10^5–10^7 types for web text), not corpus-sized. The collect
  * is capped BEFORE it runs (`limit(maxTypes + 1)` — at most one excess
  * row crosses to the driver, then the bound throws; no silent cap and no
  * unbounded materialization), and `minCount` prunes the hapax tail that
  * merge counting cannot use anyway.
  *
  * Deterministic: ties on pair frequency break lexicographically, so the
  * learned merge table is byte-reproducible (CPython twin in
  * tools/gen_expected.py).
  */
object BpeTrain {

  /** Distributed word-frequency dict: lowercase whitespace tokens
    * (the shared `Quality.tokens` Spark expression). */
  def wordCounts(df: DataFrame, textCol: String, minCount: Long = 2L): DataFrame =
    df.select(explode(PiiFunctions.tokensCol(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  /** Word → symbol sequence: one symbol per CODE POINT (a supplementary
    * char must stay one symbol — splitting surrogates would learn invalid
    * half-char merges and diverge from the code-point-based twin). */
  private[spark] def symbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Classic BPE merge learning over a word-frequency dict: every word is
    * a symbol sequence + an end-of-word sentinel; each round merges the
    * most frequent adjacent symbol pair (count desc, then pair
    * lexicographic). Returns (rank, left, right, freq). */
  def learnMerges(wordFreq: Seq[(String, Long)],
                  numMerges: Int): Seq[(Int, String, String, Long)] = {
    val Eow = "</w>"
    var words: Array[(Array[String], Long)] = wordFreq.map { case (w, n) =>
      (symbols(w) :+ Eow, n)
    }.toArray
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), freq) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank, l, r, freq))
        val merged = l + r
        words = words.map { case entry @ (syms, n) =>
          // most words don't contain the merged pair — detect in a cheap
          // scan and keep the existing array untouched (no per-word
          // allocation per round for the unaffected majority)
          var hit = false
          var i = 0
          while (!hit && i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) hit = true
            i += 1
          }
          if (!hit) entry
          else {
            val b = Array.newBuilder[String]
            i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                b += merged; i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), n)
          }
        }
        rank += 1
      }
    }
    out.result()
  }

  /** End-to-end: distributed dict → driver merge loop → merges relation. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, maxTypes: Int = 1000000): DataFrame = {
    val wc = wordCounts(df, textCol, minCount)
    // cap the transfer BEFORE collecting: at most maxTypes+1 rows reach
    // the driver, so the bound fires as an exception, not an OOM
    val types = wc.limit(maxTypes + 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(types.length <= maxTypes,
      s"word dict exceeds maxTypes=$maxTypes — raise the bound or " +
        "minCount (the merge loop is driver-side over the dict)")
    // collect order is partition-dependent; the loop's tie-break makes the
    // result order-independent, but sort anyway so the input is canonical
    val dict = types.sortBy(t => (t._1, t._2)).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    learnMerges(dict, numMerges).toDF("rank", "left", "right", "freq")
  }
}
