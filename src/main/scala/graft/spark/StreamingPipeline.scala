package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming face of the engine.
  *
  * The reference service is strictly request/response (SURVEY §2.9) and the
  * north-rule pipeline is batch with ledger resume — but the same per-row
  * stages are stateless, so the identical [[Pipeline.run]] plan runs
  * unchanged on a streaming DataFrame (`readStream` source → transforms →
  * `writeStream`). This object adds the streaming-only pieces: watermarked
  * windowed monitoring aggregates and a file-stream entry point.
  */
object StreamingPipeline {

  /** Same stages as the batch pipeline — [[Pipeline.run]] is
    * streaming-safe (narrow, stateless, broadcast models). */
  def run(spark: SparkSession, pagesStream: DataFrame,
          conf: Pipeline.Conf = Pipeline.Conf()): DataFrame =
    Pipeline.run(spark, pagesStream, conf)

  /** Keep/drop rate per event-time window and language — the monitoring
    * stream a crawl ingestion job would publish. Watermark bounds state so
    * the aggregation runs forever on unbounded input. */
  def keepRateByWindow(scored: DataFrame, window: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    scored
      .withWatermark("warc_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window),
        col("lang_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(aggregate(map_values(col("n_hits")), lit(0L), (a, v) => a + v))
          .as("n_pii_hits"))

  /** File-source entry point: new parquet page files appearing under `path`
    * stream through the pipeline into partitioned parquet, checkpointed —
    * the streaming twin of the batch ledger resume. */
  def fileStream(spark: SparkSession, inPath: String, outPath: String,
                 checkpoint: String, conf: Pipeline.Conf = Pipeline.Conf()) = {
    val pages = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(inPath)
    Pipeline.withBucket(run(spark, pages, conf), conf)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("part_bucket")
  }
}
