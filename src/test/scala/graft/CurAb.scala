package graft

import graft.spark.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only curation-stage A/B (Test/runMain graft.CurAb <pagesParquet>):
  * isolates where the staged curation's pipeline stage spends time —
  * compute-only vs keep-filter vs parquet-staged — judged by wall + process
  * cpu, one fresh JVM. */
object CurAb {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/tmp/pages3m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(label: String)(job: => Unit): Unit = {
      val cpu0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      job
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      println(f"CURAB $label sec=$sec%.1f cpuSec=$cpuSec%.1f")
    }
    val pages = s.read.parquet(in)
    time("scored_noop") {
      Pipeline.run(s, pages).write.format("noop").mode("overwrite").save()
    }
    time("kept_noop") {
      Pipeline.run(s, pages).where(col("keep"))
        .write.format("noop").mode("overwrite").save()
    }
    time("kept_parquet") {
      Pipeline.run(s, pages).where(col("keep"))
        .write.mode("overwrite").parquet("/tmp/curab_kept")
    }
    // every optional stage on + keep filter: catches duplication traps in
    // the extension columns (toxicity count, model_keep) under pushdown
    val w = graft.spark.QualityTrain.trainNg(
      pages.select(col("text")).limit(20000), "text")
    val conf = Pipeline.Conf(
      toxicity = Some(Seq("kappa", "rho")),
      qualityModel = Some(w))
    time("kept_ext_noop") {
      Pipeline.run(s, pages, conf).where(col("keep"))
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
