package graft.spark

import org.apache.spark.sql.{Encoder, Encoders, Row, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed run-metrics aggregation (SURVEY §2.9): a single `Aggregator` fold
  * over the scored frame producing the whole run summary in one pass —
  * map-side partial aggregation does the per-partition work, so the shuffle
  * carries one small buffer per partition regardless of corpus size (the
  * op-27 analog of the reference's X-Replaced-* counters, as a typed agg
  * instead of `observe`, for callers that want the stats AS a value).
  */
object Metrics {

  final case class RunStats(
      docs: Long,
      kept: Long,
      totalChars: Long,
      totalHits: Long,
      piiDocs: Long,
      maxPpl: Double,
      droppedByReason: Map[String, Long]) {
    def keepRate: Double = if (docs == 0) 0.0 else kept.toDouble / docs
  }

  /** Input projection the aggregator expects (selected from the scored
    * frame): (keep, drop_reason, n_chars, n_hits_total, ppl). */
  final case class ScoredLite(keep: Boolean, drop_reason: String,
                              n_chars: Long, n_hits: Long, ppl: Double)

  val runStats: TypedColumn[ScoredLite, RunStats] =
    new Aggregator[ScoredLite, RunStats, RunStats] {
      override def zero: RunStats = RunStats(0, 0, 0, 0, 0, 0.0, Map.empty)
      override def reduce(b: RunStats, r: ScoredLite): RunStats = RunStats(
        b.docs + 1,
        b.kept + (if (r.keep) 1 else 0),
        b.totalChars + r.n_chars,
        b.totalHits + r.n_hits,
        b.piiDocs + (if (r.n_hits > 0) 1 else 0),
        math.max(b.maxPpl, r.ppl),
        if (r.keep) b.droppedByReason
        else b.droppedByReason.updatedWith(r.drop_reason)(c => Some(c.getOrElse(0L) + 1L)))
      override def merge(a: RunStats, b: RunStats): RunStats = RunStats(
        a.docs + b.docs, a.kept + b.kept, a.totalChars + b.totalChars,
        a.totalHits + b.totalHits, a.piiDocs + b.piiDocs,
        math.max(a.maxPpl, b.maxPpl),
        (a.droppedByReason.keySet ++ b.droppedByReason.keySet).map(k =>
          k -> (a.droppedByReason.getOrElse(k, 0L) + b.droppedByReason.getOrElse(k, 0L))).toMap)
      override def finish(r: RunStats): RunStats = r
      override def bufferEncoder: Encoder[RunStats] = Encoders.product[RunStats]
      override def outputEncoder: Encoder[RunStats] = Encoders.product[RunStats]
    }.toColumn

  /** Convenience: scored pipeline frame → one RunStats. */
  def collect(scored: org.apache.spark.sql.DataFrame): RunStats = {
    import org.apache.spark.sql.functions._
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(
        col("keep"), col("drop_reason"),
        col("quality.nChars").as("n_chars"),
        aggregate(map_values(col("n_hits")), lit(0L), (a, v) => a + v).as("n_hits"),
        col("ppl"))
      .as[ScoredLite]
      .select(runStats)
      .head()
  }
}
