package graft.sources

import graft.spark.DataGen
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** DataSource V2 slot for the reference's URL-fetch ingestion (op 2,
  * app/main.py:90-95: server-side `httpx.get` of a submitted URL).
  *
  * This sandbox has zero egress, so the FETCH KERNEL IS AN OFFLINE STUB
  * (clearly marked below): `file:` URLs read the local file; anything else
  * yields a deterministic synthetic page. What is REAL and load-bearing is
  * the Spark-side shape a 100-TB crawl ingestion needs:
  *   - a url manifest is split into [[UrlBatch]] input partitions of
  *     `batchSize` urls, so fetch parallelism = ceil(urls/batchSize) tasks
  *     and a slow host stalls one task, not the stage;
  *   - each partition reader fetches ITS urls only (no driver-side IO) and
  *     emits rows in the pages schema (url, warc_ts, html, text, lang) —
  *     the same table every downstream pipeline stage already consumes.
  * A real implementation swaps [[UrlFetchReader.fetch]] for an HTTP client
  * with politeness/timeout policy; nothing else changes.
  *
  * Usage:
  *   spark.read.format("graft.sources.UrlFetchSource")
  *     .option("manifest", "/path/urls.txt").option("batchSize", "64").load()
  */
class UrlFetchSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UrlFetchSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive by convention; `properties` arrives
    // as a plain map, so normalize before lookup (.option("batchsize", ...)
    // must not silently fall back to the default)
    val opts = new CaseInsensitiveStringMap(properties)
    new UrlFetchTable(opts.get("manifest"),
      Option(opts.get("batchSize")).map(_.toInt).getOrElse(64))
  }
}

object UrlFetchSource {
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))
}

final class UrlFetchTable(manifest: String, batchSize: Int)
    extends Table with SupportsRead {
  require(manifest != null, "option 'manifest' (path to a url list) is required")
  override def name(): String = s"url_fetch($manifest)"
  override def schema(): StructType = UrlFetchSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new UrlFetchScan(manifest, batchSize)
}

/** One input partition = one batch of urls to fetch. */
final case class UrlBatch(urls: Array[String]) extends InputPartition

final class UrlFetchScan(manifest: String, batchSize: Int)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def toBatch: Batch = this
  override def readSchema(): StructType = UrlFetchSource.Schema
  override def description(): String = s"UrlFetchScan(manifest=$manifest)"

  /** Planned splits: the manifest (a small driver-side file listing urls,
    * one per line) is chunked into fetch tasks. */
  override def planInputPartitions(): Array[InputPartition] = {
    val urls = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(manifest))
    import scala.jdk.CollectionConverters._
    urls.asScala.iterator.map(_.trim).filter(_.nonEmpty)
      .grouped(batchSize).map(g => UrlBatch(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new UrlFetchReader(partition.asInstanceOf[UrlBatch])
}

final class UrlFetchReader(batch: UrlBatch) extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < batch.urls.length }

  /** OFFLINE FETCH STUB — zero-egress sandbox. `file:` urls read the local
    * file (the testable path); other schemes yield a deterministic
    * synthetic page keyed by the url hash. A real build replaces this
    * body with an HTTP client (timeouts, robots, retry). */
  private def fetch(url: String): (Array[Byte], String, String) =
    if (url.startsWith("file:")) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(new java.net.URI(url)))
      (bytes, graft.core.HtmlText.extract(bytes), "und")
    } else {
      val page = DataGen.pageFor(scala.util.hashing.MurmurHash3.stringHash(url).toLong & 0xffffffffL)
      (page.html, page.text, page.lang)
    }

  override def get(): InternalRow = {
    val url = batch.urls(i)
    val (html, text, lang) = fetch(url)
    InternalRow(
      UTF8String.fromString(url),
      // warc_ts: micros; stub stamps a fixed crawl epoch for determinism
      1704067200000000L,
      html,
      UTF8String.fromString(text),
      UTF8String.fromString(lang))
  }
  override def close(): Unit = ()
}
