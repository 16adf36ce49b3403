package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` + typed metadata, with decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The container ships no image/audio codecs, so the DECODE KERNELS ARE
  * DETERMINISTIC STUBS (clearly marked below) — what is real and tested is
  * the Spark-side plumbing this pipeline needs at 100 TB: the schema, the
  * batched `mapPartitions` shape (the JVM twin of `mapInPandas`: iterate a
  * partition in fixed-size batches so a vectorized kernel amortizes per-call
  * overhead), partition-preserving narrow execution, and the explode pattern
  * for frame sampling. Swapping a real decoder in changes only the stub
  * bodies. The reference's pixel ops (SURVEY §2.7) define the operator
  * surface being mirrored: decode+EXIF+thumbnail cap (op 5), raster (op 4),
  * face/feature extraction (op 30).
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
                             durationMs: Long, codec: String)
  final case class MediaRow(media_id: Long, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, features: Array[Float],
                                 width: Int, height: Int)
  final case class Frame(media_id: Long, frame_no: Int, ts_ms: Long,
                         features: Array[Float])

  /** STUB decode: a real implementation would decode the container and
    * return pixel/sample buffers. Here: deterministic pseudo-features from
    * seeded murmur over the bytes — stable across executors/runs. */
  def decodeFeaturesStub(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    Array.tabulate(dim) { i =>
      val h = MurmurHash3.bytesHash(bytes, i)
      (h.toDouble / Int.MaxValue.toDouble).toFloat
    }
  }

  /** Thumbnail-cap rule ported for real (reference app/main.py:267-269,
    * settings.py:43): downscale so max side ≤ maxSide, aspect preserved. */
  def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxSide) (w, h)
    else {
      val scale = maxSide.toDouble / m
      (math.max(1, math.round(w * scale).toInt), math.max(1, math.round(h * scale).toInt))
    }
  }

  /** Deterministic media table derived from any binary column (tests use
    * pages.html). Metadata synthesized from the row id with plain integer
    * arithmetic — deterministic AND reproducible by the SQL oracle, so the
    * downstream featurize/frame-sample queries get real DuckDB checks. */
  def mediaTable(spark: SparkSession, bin: DataFrame, idCol: String,
                 bytesCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    bin.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        // floorMod: total over negative ids too (% would index/size negative)
        val kind = Vector("image", "audio", "video")(java.lang.Math.floorMod(id, 3L).toInt)
        MediaRow(id, bytes, MediaMeta(kind,
          width = (320 + java.lang.Math.floorMod(id * 37, 1700L)).toInt,
          height = (240 + java.lang.Math.floorMod(id * 53, 900L)).toInt,
          durationMs = if (kind == "image") 0L else 1000L + java.lang.Math.floorMod(id * 97, 60000L),
          codec = if (kind == "image") "png" else "opus"))
      }
  }

  /** Batched feature extraction — the mapInPandas-shaped operator: each
    * partition is consumed in `batchSize` groups so a real vectorized
    * decoder would get amortized batches; narrow (partition-preserving). */
  def featurize(media: Dataset[MediaRow], maxSide: Int = 2048,
                batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real kernel would decode `batch` in one vectorized call
        batch.iterator.map { m =>
          val (w, h) = resizeDims(m.meta.width, m.meta.height, maxSide)
          MediaFeatures(m.media_id, decodeFeaturesStub(m.bytes), w, h)
        }
      }
    }
  }

  /** Frame sampling for video/audio rows: one output row per sampled
    * timestamp (every `everyMs`), features per frame via the stub. */
  def frameSample(media: Dataset[MediaRow], everyMs: Long = 10000L,
                  maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.durationMs > 0).flatMap { m =>
      val n = math.min(maxFrames, (m.meta.durationMs / everyMs + 1).toInt)
      (0 until n).iterator.map { f =>
        Frame(m.media_id, f, f * everyMs,
          decodeFeaturesStub(m.bytes ++ BigInt(f).toByteArray))
      }
    }
  }
}
