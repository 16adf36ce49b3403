package graft

import graft.spark.DataGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only big-corpus generator for scale rehearsals
  * (Test/runMain graft.GenBigCorpus <nDocs> <outPath>): DataGen pages plus
  * the q_curation planting recipe at scale — ~1% exact copies (id%100==7,
  * copy.example hosts) and ~1% near copies (id%100==13, appended tail
  * line) — so the near-dup collapse has real cross-doc work to do. */
object GenBigCorpus {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val out = args.lift(1).getOrElse("/tmp/pages3m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val base = DataGen.pages(s, n).toDF()
    val copies = s.range(0, n).filter(col("id") % 100 === 7).as[Long]
      .map(id => DataGen.pageFor(id).copy(url = s"https://copy.example/c/$id"))
      .toDF()
    val nears = s.range(0, n).filter(col("id") % 100 === 13).as[Long]
      .map { id =>
        val p = DataGen.pageFor(id)
        p.copy(url = s"https://near.example/c/$id",
          text = p.text + "\nextra tail line")
      }.toDF()
    base.unionByName(copies).unionByName(nears)
      .write.mode("overwrite").parquet(out)
    println(s"wrote $out (${s.read.parquet(out).count()} rows)")
    s.stop()
  }
}
