package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan capture: Test/runMain graft.PlanDump <outDir> <query>...
  * Writes `<outDir>/<query>.txt` with the formatted physical plan of each
  * named query (same session shape as the bench's per-query phase). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val names = args.drop(1).toSeq
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SparkEntry.prewarmStreamFixture(s)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(s, "/root/testdata/sf0.1")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        plan.getBytes("UTF-8"))
      println(s"PLANDUMP wrote $name (${plan.length} chars)")
    }
    s.stop()
  }
}
