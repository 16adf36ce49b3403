package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for CO-LOCATED joins — the third leg of the
  * engine's shuffle-avoidance story (broadcast for small dims, salting for
  * skew, bucketing for repeated big-big joins).
  *
  * A curated corpus is joined repeatedly downstream — against per-host
  * reputation, dedup cluster labels, embedding shards, eval-contamination
  * marks. Each such join of two corpus-sized relations shuffles BOTH
  * sides on every run. Writing both sides bucketed by the join key makes
  * Spark's scan expose the hash distribution (`ClusteredDistribution`
  * satisfied at plan time), so the sort-merge join runs with ZERO
  * exchanges — pinned by PlanSpec. At 100 TB this converts the dominant
  * recurring shuffle of a curation→training handoff into a one-time
  * layout cost at write.
  *
  * Mechanics: `bucketBy` requires a catalog table (`saveAsTable`) — the
  * bucket spec lives in table metadata, not in the parquet files; a plain
  * `.parquet(path)` write cannot carry it. Bucket counts must MATCH on
  * both sides (or divide evenly with
  * `spark.sql.sources.bucketing.autoBucketedScan.enabled`); pick the
  * bucket count once per lake (executor-task-sized buckets: rows/bucket ≈
  * a few hundred MB).
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (overwrite). Files are still
    * parquet on disk; the bucket spec rides in the catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — planned with no
    * shuffle on either side. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    on: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(on))
}
