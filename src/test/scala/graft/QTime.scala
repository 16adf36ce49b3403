package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: Test/runMain graft.QTime <query> [runs]. */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 4
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (0 until runs).foreach { i =>
      val cpu0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      println(f"QTIME $name run=$i sec=$sec%.2f cpuSec=$cpuSec%.1f")
    }
    s.stop()
  }
}
