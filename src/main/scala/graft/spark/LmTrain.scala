package graft.spark

import graft.core.{Perplexity, PerplexityModel}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed KenLM-style LM training — the companion of the perplexity
  * SCORER ([[graft.core.Perplexity]]): learn the quality LM from the corpus
  * itself instead of an embedded seed (how CCNet-style pipelines actually
  * obtain their per-language KenLM binaries).
  *
  * Scale shape: the corpus-sized work is a single narrow `mapPartitions`
  * pass that folds every partition into one dense trigram-count array
  * (A^3 = 54 872 cells ≈ 430 KB) and emits only its non-zero cells, then a
  * bounded hash-agg (≤ A^3 rows per partition reach the shuffle — map-side
  * combine is explicit, not hoped-for). The trigram relation is the entire
  * sufficient statistic: bigram/unigram orders marginalize from it on the
  * driver (`Perplexity.fromCounts`), so the collect is ≤ 54 872 rows no
  * matter the corpus size — 100 TB of text shuffles at most
  * `partitions × 54 872` pre-combined rows and collects one model's worth.
  *
  * Semantics (the CPython twin in tools/gen_expected.py mirrors both):
  * context resets to (space, space) per DOCUMENT (documents are independent
  * samples — a corpus-order carry would make the counts partition-order
  * dependent), and each document contributes at most its first 8192 CODE
  * POINTS (Python slice semantics — the twin's `t[:8192]`), mirroring the
  * scorer's cap so training and scoring see the same distribution. The
  * scorer hot paths iterate UTF-16 units for speed; the corpus BMP-only
  * invariant that makes the two equivalent is documented in FIXTURES.md.
  */
object LmTrain {
  import Perplexity.{A, SpaceSym}

  final val MaxChars = 8192

  /** Non-zero trigram counts over the corpus: (gram, n) with
    * gram = (p2*A + p1)*A + c0. Deterministic, layout-independent. */
  def gramCounts(df: DataFrame, textCol: String): DataFrame = {
    val texts: Dataset[String] = {
      import df.sparkSession.implicits._
      df.select(col(textCol).cast("string")).as[String]
    }
    import texts.sparkSession.implicits._
    texts.mapPartitions { it =>
      val counts = new Array[Long](A * A * A)
      it.foreach { t =>
        if (t != null) {
          // iterate CODE POINTS with the cap in code points — the CPython
          // twin's `t[:8192]` counts code points, so a surrogate pair must
          // be ONE symbol event here too, or any astral-plane character
          // silently breaks golden parity
          val len = t.length
          var p2 = SpaceSym
          var p1 = SpaceSym
          var i = 0
          var n = 0
          while (i < len && n < MaxChars) {
            val ch = t.charAt(i)
            val cp =
              if (Character.isHighSurrogate(ch) && i + 1 < len &&
                  Character.isLowSurrogate(t.charAt(i + 1))) {
                i += 1; Character.toCodePoint(ch, t.charAt(i))
              } else ch.toInt
            val c0 = Perplexity.symCp(cp)
            counts((p2 * A + p1) * A + c0) += 1L
            p2 = p1; p1 = c0
            i += 1; n += 1
          }
        }
      }
      Iterator.range(0, counts.length)
        .filter(counts(_) != 0L)
        .map(g => (g, counts(g)))
    }.toDF("gram", "n")
      .groupBy(col("gram")).agg(sum(col("n")).as("n"))
  }

  /** End-to-end: distributed counts → driver-side smoothing → model.
    * The collect is bounded by A^3 rows regardless of corpus size. */
  def train(df: DataFrame, textCol: String, k: Double = 0.1): PerplexityModel = {
    val c3 = new Array[Long](A * A * A)
    gramCounts(df, textCol).collect().foreach { r =>
      c3(r.getInt(0)) = r.getLong(1)
    }
    Perplexity.fromCounts(c3, k)
  }
}
