package graft

import graft.spark.{DataGen, Pipeline, StreamingPipeline}
import org.apache.spark.sql.SparkSession

/** Dev-only: where does q_stream_pipeline's wall time go?
  * Runs the streaming round trip over a 1-file and a 32-file fixture and
  * prints per-microbatch progress + phase timings. */
object StreamAb {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def fixture(nFiles: Int): String = {
      val in = java.nio.file.Files.createTempDirectory(s"graft-sab-$nFiles").toString
      val df = DataGen.pages(s, 2000).toDF()
      (if (nFiles == 1) df.coalesce(1) else df).write.mode("overwrite").parquet(in)
      in
    }

    def runOnce(label: String, in: String): Unit = {
      val t0 = System.nanoTime()
      val tmp = java.nio.file.Files.createTempDirectory("graft-sab-out").toString
      val q = StreamingPipeline
        .fileStream(s, in, s"$tmp/out", s"$tmp/ck",
          Pipeline.Conf(toxicity = Some(Seq("kappa", "rho"))))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val t1 = System.nanoTime()
      val n = s.read.parquet(s"$tmp/out").count()
      val t2 = System.nanoTime()
      println(f"STREAMAB $label stream=${(t1 - t0) / 1e9}%.2f readback=${(t2 - t1) / 1e9}%.2f rows=$n batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"STREAMAB $label batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    }

    val in32 = fixture(32)
    val in1 = fixture(1)
    runOnce("files32-cold", in32)
    runOnce("files32-warm", in32)
    runOnce("files1-warm", in1)
    runOnce("files1-warm2", in1)
    s.stop()
  }
}
