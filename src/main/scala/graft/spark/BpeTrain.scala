package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * -sized (≈10^5–10^7 types for web text), not corpus-sized. `maxTypes`
  * bounds the driver collect explicitly (no silent cap — it throws), and
  * `minCount` prunes the hapax tail that merge counting cannot use anyway.
  *
  * Deterministic: ties on pair frequency break lexicographically, so the
  * learned merge table is byte-reproducible (CPython twin in
  * tools/gen_expected.py).
  */
object BpeTrain {

  /** Distributed word-frequency dict: lowercase whitespace tokens
    * (Quality.tokens semantics). */
  def wordCounts(df: DataFrame, textCol: String, minCount: Long = 2L): DataFrame =
    df.select(explode(
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit(""))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  /** Classic BPE merge learning over a word-frequency dict: every word is
    * a char-symbol sequence + an end-of-word sentinel; each round merges
    * the most frequent adjacent symbol pair (count desc, then pair
    * lexicographic). Returns (rank, left, right, freq). */
  def learnMerges(wordFreq: Seq[(String, Long)],
                  numMerges: Int): Seq[(Int, String, String, Long)] = {
    val Eow = "</w>"
    var words: Array[(Array[String], Long)] = wordFreq.map { case (w, n) =>
      (w.map(_.toString).toArray :+ Eow, n)
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
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val b = Array.newBuilder[String]
            var i = 0
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
  def train(spark: SparkSession, df: DataFrame, textCol: String,
            numMerges: Int, minCount: Long = 2L,
            maxTypes: Int = 1000000): DataFrame = {
    val wc = wordCounts(df, textCol, minCount)
    val types = wc.collect().map(r => (r.getString(0), r.getLong(1)))
    require(types.length <= maxTypes,
      s"word dict has ${types.length} types > maxTypes=$maxTypes — raise the " +
        "bound or minCount (the merge loop is driver-side over the dict)")
    // collect order is partition-dependent; the loop's tie-break makes the
    // result order-independent, but sort anyway so the input is canonical
    val dict = types.sortBy(t => (t._1, t._2)).toSeq
    import spark.implicits._
    learnMerges(dict, numMerges).toDF("rank", "left", "right", "freq")
  }
}
