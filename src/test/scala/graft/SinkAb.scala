package graft

import graft.spark.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only sink-encoding A/B (Test/runMain graft.SinkAb): isolates the
  * parquet write cost of the scored output under different physical
  * layouts — maps as-is vs maps exploded to key/value arrays vs dropping
  * the dict columns — on identical data, judged by process cpu time. */
object SinkAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    val scoredPath = "/tmp/sinkab_scored"
    if (!new java.io.File(scoredPath).exists()) {
      Pipeline.withBucket(Pipeline.run(s, s.read.parquet("/tmp/pages1m")))
        .write.mode("overwrite").parquet(scoredPath)
    }

    def time(label: String)(df: DataFrame): Unit = {
      (0 until 3).foreach { i =>
        val cpu0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        df.write.mode("overwrite").partitionBy("part_bucket")
          .parquet(s"/tmp/sinkab_out")
        val sec = (System.nanoTime() - t0) / 1e9
        val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
        println(f"SINKAB $label run=$i sec=$sec%.2f cpuSec=$cpuSec%.1f")
      }
    }

    // stage decomposition of the full sink run (read → shuffle → score →
    // encode), each timed through noop except the last
    def timeJob(label: String)(job: => Unit): Unit =
      (0 until 3).foreach { i =>
        val cpu0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        job
        val sec = (System.nanoTime() - t0) / 1e9
        val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
        println(f"SINKAB $label run=$i sec=$sec%.2f cpuSec=$cpuSec%.1f")
      }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val pages = s.read.parquet("/tmp/pages1m")
    val conf = Pipeline.Conf()
    if (sys.env.get("SINKAB_STAGES").forall(_ != "0")) {
    timeJob("stage_read")(noop(pages))
    timeJob("stage_score")(noop(Pipeline.run(s, pages, conf)))
    timeJob("stage_shuffle_score")(noop(
      Pipeline.run(s, Pipeline.salted(Pipeline.withBucket(pages, conf), conf), conf)))
    timeJob("stage_full")(
      Pipeline.withBucket(
        Pipeline.run(s, Pipeline.salted(Pipeline.withBucket(pages, conf), conf), conf), conf)
        .write.mode("overwrite").partitionBy("part_bucket")
        .parquet("/tmp/sinkab_out"))

    // the writeResumable lineage tap, replicated: nondeterministic identity
    // UDF + interpreted higher-order hits aggregate in the write projection
    timeJob("stage_full_tap") {
      val acc = new graft.spark.IcebergishSink.BucketStatsAcc
      s.sparkContext.register(acc)
      val tap = udf { (bucket: Int, keep: Boolean, hits: Long) =>
        acc.add((bucket, keep, hits)); bucket
      }.asNondeterministic()
      val hitsTotal = coalesce(
        aggregate(map_values(col("n_hits")), lit(0L), (a, v) => a + v), lit(0L))
      Pipeline.withBucket(
        Pipeline.run(s, Pipeline.salted(Pipeline.withBucket(pages, conf), conf), conf), conf)
        .withColumn("part_bucket", tap(col("part_bucket"), col("keep"), hitsTotal))
        .write.mode("overwrite").partitionBy("part_bucket")
        .parquet("/tmp/sinkab_out")
    }
    }

    // tap + write-task levers (SINKAB_TAP=1): map-summing tap UDF (no
    // interpreted higher-order aggregate in the write projection),
    // column-specific dict-off, and 2× write tasks for encode/IO overlap
    if (sys.env.get("SINKAB_TAP").contains("1")) {
      def fullTap(label: String, parts: Int, opts: Map[String, String]): Unit =
        timeJob(label) {
          val acc = new graft.spark.IcebergishSink.BucketStatsAcc
          s.sparkContext.register(acc)
          val tap = udf { (bucket: Int, keep: Boolean, hits: Map[String, Long]) =>
            acc.add((bucket, keep,
              if (hits == null) 0L else hits.valuesIterator.sum))
            bucket
          }.asNondeterministic()
          Pipeline.withBucket(
            Pipeline.run(s, Pipeline.salted(Pipeline.withBucket(pages, conf),
              conf, numPartitions = parts), conf), conf)
            .withColumn("part_bucket",
              tap(col("part_bucket"), col("keep"), col("n_hits")))
            .write.mode("overwrite").options(opts).partitionBy("part_bucket")
            .parquet("/tmp/sinkab_out")
        }
      val dictOff = Map(
        "parquet.enable.dictionary#scrubbed_text" -> "false",
        "parquet.enable.dictionary#url" -> "false")
      fullTap("tap2_p32", 0, Map.empty)
      fullTap("tap2_p32_dictoff", 0, dictOff)
      fullTap("tap2_p64_dictoff", 64, dictOff)
      fullTap("tap2_p128_dictoff", 128, dictOff)
      s.stop()
      return
    }

    // encode-lever A/B on the identical scored data: column-specific
    // dictionary control + zstd level sweep (parquet-mr supports
    // `parquet.enable.dictionary#<column>` since 1.12)
    def timeOpts(label: String, opts: Map[String, String])(df: DataFrame): Unit =
      (0 until 3).foreach { i =>
        val cpu0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        df.write.mode("overwrite").options(opts).partitionBy("part_bucket")
          .parquet("/tmp/sinkab_out")
        val sec = (System.nanoTime() - t0) / 1e9
        val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
        println(f"SINKAB $label run=$i sec=$sec%.2f cpuSec=$cpuSec%.1f")
      }

    val scored = s.read.parquet(scoredPath)
    time("maps")(scored)
    timeOpts("text_dict_off", Map(
      "parquet.enable.dictionary#scrubbed_text" -> "false"))(scored)
    timeOpts("text_url_dict_off", Map(
      "parquet.enable.dictionary#scrubbed_text" -> "false",
      "parquet.enable.dictionary#url" -> "false"))(scored)
    timeOpts("zstd_l1", Map(
      "compression" -> "zstd",
      "parquet.compression.codec.zstd.level" -> "1"))(scored)
    timeOpts("zstd_l3", Map(
      "compression" -> "zstd",
      "parquet.compression.codec.zstd.level" -> "3"))(scored)
    timeOpts("uncompressed", Map("compression" -> "none"))(scored)
    time("arrays")(scored
      .withColumn("alias_keys", map_keys(col("alias_dict")))
      .withColumn("alias_vals", map_values(col("alias_dict")))
      .withColumn("hit_kinds", map_keys(col("n_hits")))
      .withColumn("hit_counts", map_values(col("n_hits")))
      .drop("alias_dict", "n_hits"))
    time("nodict")(scored.drop("alias_dict", "n_hits"))
    time("noquality")(scored.drop("quality"))
    time("textonly")(scored.select("url", "part_bucket", "keep", "scrubbed_text"))
    s.stop()
  }
}
