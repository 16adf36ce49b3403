package graft

import graft.spark.{DataGen, IcebergishSink, Pipeline}
import org.apache.spark.sql.SparkSession

/** Dev-only: phase breakdown of the q_sink_lineage gate body. */
object SinkAb2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    (0 until 3).foreach { run =>
      val out = "/tmp/graft_gate_sink_ab"
      var t = System.nanoTime()
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"SINKAB2 run=$run $name%-14s ${(now - t) / 1e9}%.2f")
        t = now
      }
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      lap("delete")
      val scored = Pipeline.withBucket(
        Pipeline.run(s, DataGen.pages(s, 2000).toDF()))
      lap("plan")
      IcebergishSink.writeResumable(s, scored, out, inputSnapshot = "gate")
      lap("writeResumable")
      val df = IcebergishSink.readLineage(out)
        .map(l => (l.bucket.toLong, l.rows, l.keepRows, l.hits))
        .toDF("bucket", "n_rows", "n_keep", "n_hits_total")
      df.write.format("noop").mode("overwrite").save()
      lap("lineage+noop")
    }
    s.stop()
  }
}
