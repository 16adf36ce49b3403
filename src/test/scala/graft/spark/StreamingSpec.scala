package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming face must produce row-for-row the same results as the
  * batch pipeline, and the windowed monitoring aggregate must respect
  * watermarks. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("streaming pipeline output equals batch pipeline output") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val pages = (0L until 300L).map(DataGen.pageFor(_))
    val stream = MemoryStream[Page]
    stream.addData(pages)
    val q = StreamingPipeline.run(spark, stream.toDF())
      .writeStream.format("memory").queryName("scored_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scored_stream")
      .select("url", "keep", "drop_reason", "scrubbed_text")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    val batch = Pipeline.run(spark, pages.toDF())
      .select("url", "keep", "drop_reason", "scrubbed_text")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("watermarked keep-rate window aggregates per event-time hour") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Page]
    stream.addData((0L until 500L).map(DataGen.pageFor(_)))
    val agg = StreamingPipeline.keepRateByWindow(
      StreamingPipeline.run(spark, stream.toDF()), "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("keeprate")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("keeprate").collect()
    assert(rows.nonEmpty)
    // 500 docs at 1/sec from t0 span exactly one hour bucket
    val total = spark.table("keeprate").agg(sum("n_docs")).head().getLong(0)
    assert(total == 500L)
    assert(spark.table("keeprate").agg(sum("n_keep")).head().getLong(0) > 0L)
  }
}
