package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** DSv2 URL-fetch source (op 2): planned splits + pages-schema rows.
  * The fetch kernel is an offline stub; the split planning, partition
  * readers, and schema contract are real. */
class UrlFetchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("manifest splits into batch partitions and yields pages-schema rows") {
    val html = Files.createTempFile("graft-fetch", ".html")
    Files.writeString(html, "<html><body>hello fetched &amp; page</body></html>")
    val manifest = Files.createTempFile("graft-manifest", ".txt")
    val urls = (0 until 130).map(i => s"https://site-$i.example/page") :+
      html.toUri.toString
    Files.writeString(manifest, urls.mkString("\n"))

    val df = spark.read.format("graft.sources.UrlFetchSource")
      .option("manifest", manifest.toString).option("batchSize", "10").load()
    assert(df.columns.toSeq ==
      Seq("url", "warc_ts", "html", "text", "lang"))
    // 131 urls / 10 per batch = 14 planned fetch partitions — a count the
    // DEFAULT batch size (64 → 3) cannot produce, so a silently dropped
    // batchSize option fails here
    assert(df.rdd.getNumPartitions == 14)
    assert(df.count() == 131)
    // file: urls really read local content; text extraction round-trips
    val local = df.where(col("url").startsWith("file:"))
      .select("text").head().getString(0)
    assert(local == "hello fetched & page")
    // stub pages are deterministic per url
    val a = df.where(col("url") === "https://site-7.example/page")
      .select("text").head().getString(0)
    val b = spark.read.format("graft.sources.UrlFetchSource")
      .option("manifest", manifest.toString).load()
      .where(col("url") === "https://site-7.example/page")
      .select("text").head().getString(0)
    assert(a == b && a.nonEmpty)
  }

  test("DSv2 options are case-insensitive (batchsize == batchSize)") {
    val manifest = Files.createTempFile("graft-manifest-ci", ".txt")
    Files.writeString(manifest,
      (0 until 130).map(i => s"https://ci-$i.example/p").mkString("\n"))
    val df = spark.read.format("graft.sources.UrlFetchSource")
      .option("MANIFEST", manifest.toString).option("batchsize", "10").load()
    // 130/10 = 13 partitions; a silently dropped lowercase option would
    // fall back to 64 → 3 partitions
    assert(df.rdd.getNumPartitions == 13)
  }
}
